#!/usr/bin/env python
"""Entry point: COLMAP SfM preprocessing (see langsplat_tpu/cli/convert_cli.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from langsplat_tpu.cli.convert_cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
