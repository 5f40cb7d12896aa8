#!/usr/bin/env python
"""End-to-end training smoke ON THE REAL TPU (compiled pallas backend):
phase A with densify/opacity-reset cycles, then phase B features, then render."""
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import numpy as np

tmp = tempfile.mkdtemp(prefix="tpusmoke_")
root = os.path.join(tmp, "scene")
out = os.path.join(tmp, "run")

from tests.test_data import make_colmap_scene
make_colmap_scene(root, n_cams=3)
lf_dir = os.path.join(root, "language_features_dim3")
os.makedirs(lf_dir, exist_ok=True)
rng = np.random.default_rng(0)
for i in range(3):
    seg = rng.integers(-1, 4, (4, 48, 64)).astype(np.int32)
    feats = rng.normal(size=(4, 3)).astype(np.float32)
    np.save(os.path.join(lf_dir, f"img_{i:03d}_s.npy"), seg)
    np.save(os.path.join(lf_dir, f"img_{i:03d}_f.npy"), feats)

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from langsplat_tpu.cli.train_cli import main as train_main
from langsplat_tpu.cli.render_cli import main as render_main

train_main([
    "-s", root, "-m", out, "--no_include_feature", "--resolution", "1",
    "--iterations", "40", "--quiet",
    "--densify_from_iter", "5", "--densification_interval", "10",
    "--densify_until_iter", "25", "--opacity_reset_interval", "20",
    "--densify_grad_threshold", "0.0000001",
    "--test_iterations", "40", "--save_iterations", "40",
    "--checkpoint_iterations", "40", "--sh_degree", "1",
])
pa = out + "_-1"
assert os.path.exists(os.path.join(pa, "chkpnt40.npz")), "phase A ckpt missing"
print("phase A OK (compiled pallas on", jax.default_backend(), ")")

train_main([
    "-s", root, "-m", out, "--resolution", "1",
    "--iterations", "20", "--quiet", "--feature_level", "1",
    "--start_checkpoint", os.path.join(pa, "chkpnt40.npz"),
    "--test_iterations", "20", "--save_iterations", "20",
])
print("phase B OK")

render_main(["-m", pa, "--skip_test"])
print("render OK")
print("TPU SMOKE PASSED")
