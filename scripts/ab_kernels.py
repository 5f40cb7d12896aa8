#!/usr/bin/env python
"""Sequential kernel-knob A/B at full bench scale on an uncontended chip.

Runs bench.py under a matrix of env configs (the fwd_mult axis by default) and prints one result line per config plus a ranked summary.
Refuses to start while a *live* quality-run RUNNING lock exists (same guard
bench.py reports; stale locks from killed runs are ignored): an A/B on a
contended chip ranks noise, not kernels.

Usage: python scripts/ab_kernels.py [--quick] [--allow_contended] [--out F]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_CONFIGS = [
    # name, env overrides — the fwd_mult axis is the one measured lever left
    # after the r05 A/B retired the fwd/bwd_super read-DMA knobs (losers at
    # bench scale; see docs/ROOFLINE.md round-5 notes)
    ("mult1-base", {}),
    ("mult2", {"BENCH_FWD_MULT": "2"}),
    ("mult4", {"BENCH_FWD_MULT": "4"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="200k gaussians / 3 steps instead of the full bench")
    ap.add_argument("--allow_contended", action="store_true")
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-config bench timeout (s)")
    ap.add_argument("--out", default=os.path.join(REPO, ".ab_kernels.json"))
    args = ap.parse_args()

    from langsplat_tpu.utils.chiplock import active_quality_locks
    locks = active_quality_locks(REPO)
    if locks and not args.allow_contended:
        sys.exit(f"refusing to A/B on a contended chip ({locks}); "
                 f"wait or pass --allow_contended")

    results = []

    def flush():
        # written after every config: a timeout/crash mid-matrix still leaves
        # the completed configs on disk (ADVICE r4)
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)

    for name, env in DEFAULT_CONFIGS:
        e = dict(os.environ, **env)
        if args.quick:
            e.setdefault("BENCH_N", "200000")
            e.setdefault("BENCH_STEPS", "3")
        try:
            p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                               env=e, capture_output=True, text=True,
                               timeout=args.timeout)
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {"error": p.stderr.strip()[-500:]}
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout after {args.timeout:.0f}s"}
        rec["config"] = name
        rec["env"] = env
        results.append(rec)
        print(json.dumps(rec), flush=True)
        flush()

    ranked = sorted((r for r in results if r.get("value")),
                    key=lambda r: -r["value"])
    print("\n== ranked ==")
    for r in ranked:
        print(f"{r['config']:>22}: {r['value'] / 1e6:8.2f} M px/s "
              f"(spread {r.get('slope_spread')})")


if __name__ == "__main__":
    main()
