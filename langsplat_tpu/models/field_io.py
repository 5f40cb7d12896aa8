"""GaussianField persistence: reference-format PLY interop + full training checkpoints.

PLY columns match `/root/reference/scene/gaussian_model.py:243-324` exactly
(x,y,z,nx,ny,nz,f_dc_0..2,f_rest_0..44,opacity,scale_0..2,rot_0..3, all float32, alive
Gaussians only, language features NOT stored — reference parity), so fields round-trip
with the reference implementation in both directions.

Checkpoints are a single npz with params + optimizer state + step + capacity metadata
(the reference's pickled 12/13-tuples, `train.py:140-142`, become one self-describing
archive; SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.data import ply
from langsplat_tpu.models.gaussian_field import GaussianField


def save_ply(field: GaussianField, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    alive = np.asarray(field.alive)
    cols: dict[str, np.ndarray] = {}
    xyz = np.asarray(field.xyz)[alive]
    n = xyz.shape[0]
    cols["x"], cols["y"], cols["z"] = xyz.T.astype(np.float32)
    for k in ("nx", "ny", "nz"):
        cols[k] = np.zeros(n, np.float32)
    f_dc = np.asarray(field.features_dc)[alive]          # [n, 1, 3]
    # reference layout: transpose(1,2).flatten -> channel-major over coeffs
    f_dc_flat = f_dc.transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_dc_flat.shape[1]):
        cols[f"f_dc_{i}"] = f_dc_flat[:, i].astype(np.float32)
    f_rest = np.asarray(field.features_rest)[alive]      # [n, K-1, 3]
    f_rest_flat = f_rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_rest_flat.shape[1]):
        cols[f"f_rest_{i}"] = f_rest_flat[:, i].astype(np.float32)
    cols["opacity"] = np.asarray(field.opacity)[alive][:, 0].astype(np.float32)
    scaling = np.asarray(field.scaling)[alive]
    for i in range(3):
        cols[f"scale_{i}"] = scaling[:, i].astype(np.float32)
    rotation = np.asarray(field.rotation)[alive]
    for i in range(4):
        cols[f"rot_{i}"] = rotation[:, i].astype(np.float32)
    ply.write_ply(path, cols)


def load_ply(path: str, *, capacity: int | None = None) -> GaussianField:
    cols = ply.read_ply(path)
    n = len(cols["x"])
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < {n}")

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1)[:, None, :]

    rest_names = sorted((k for k in cols if k.startswith("f_rest_")),
                        key=lambda k: int(k.split("_")[-1]))
    k_rest = len(rest_names) // 3
    f_rest = np.stack([cols[k] for k in rest_names], axis=1)
    f_rest = f_rest.reshape(n, 3, k_rest).transpose(0, 2, 1)  # reference layout

    scale_names = sorted((k for k in cols if k.startswith("scale_")),
                         key=lambda k: int(k.split("_")[-1]))
    rot_names = sorted((k for k in cols if k.startswith("rot_")),
                       key=lambda k: int(k.split("_")[-1]))
    scaling = np.stack([cols[k] for k in scale_names], axis=1)
    rotation = np.stack([cols[k] for k in rot_names], axis=1)
    opacity = cols["opacity"][:, None]

    def padded(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    return GaussianField(
        xyz=padded(xyz),
        features_dc=padded(f_dc),
        features_rest=padded(f_rest),
        scaling=padded(scaling, -10.0),
        rotation=jnp.asarray(np.concatenate(
            [rotation, np.tile([1, 0, 0, 0], (cap - n, 1))], axis=0,
            dtype=np.float32)),
        opacity=padded(opacity, -10.0),
        language_feature=None,
        alive=jnp.zeros((cap,), bool).at[:n].set(True),
    )


def save_checkpoint(path: str, field: GaussianField, opt_state, stats, step: int,
                    spatial_lr_scale: float, active_sh_degree: int) -> None:
    """Full training-state checkpoint: one self-describing npz holding three
    independently-restorable leaf groups (field / optimizer / densify stats) plus
    scalar metadata — the TPU equivalent of the reference's pickled capture()
    12/13-tuples (`/root/reference/scene/gaussian_model.py:63-92`,
    `train.py:140-142`). Grouped leaves let a phase handoff restore the field
    without knowing the other phase's optimizer treedef."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat: dict[str, np.ndarray] = {}
    for group, tree in (("field", field), ("opt", opt_state), ("stats", stats)):
        for i, leaf in enumerate(jax.tree.flatten(tree)[0]):
            flat[f"{group}_{i}"] = np.asarray(leaf)
    flat["__step"] = np.int64(step)
    flat["__spatial_lr_scale"] = np.float64(spatial_lr_scale)
    flat["__active_sh_degree"] = np.int64(active_sh_degree)
    flat["__has_feature"] = np.bool_(field.language_feature is not None)
    np.savez(path, **flat)


def _unflatten_group(data, group: str, template):
    _, treedef = jax.tree.flatten(template)
    leaves = [jnp.asarray(data[f"{group}_{i}"]) for i in range(treedef.num_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def checkpoint_has_state(path: str) -> bool:
    """True if the npz carries optimizer + stats groups (full resume possible)."""
    with np.load(path, allow_pickle=False) as data:
        return any(k.startswith("opt_") for k in data.files)


def load_field(path: str, template: GaussianField):
    """Restore only the field group (+ scalars) — used by the render CLI and by
    phase handoff, where the saved optimizer belongs to the other phase. The
    template adapts to the checkpoint's feature-phase flag; restored capacity is
    whatever the checkpoint holds (treedefs carry no shapes). Returns
    (field, step, spatial_lr_scale, active_sh_degree, has_feature)."""
    from dataclasses import replace as dc_replace
    data = np.load(path, allow_pickle=False)
    has_feature = bool(data["__has_feature"]) if "__has_feature" in data else False
    tmpl = template
    if has_feature and tmpl.language_feature is None:
        tmpl = tmpl.with_language_feature(3)
    elif not has_feature and tmpl.language_feature is not None:
        tmpl = dc_replace(tmpl, language_feature=None)
    field = _unflatten_group(data, "field", tmpl)
    return (field, int(data["__step"]), float(data["__spatial_lr_scale"]),
            int(data["__active_sh_degree"]), has_feature)


def load_checkpoint(path: str, field_template: GaussianField, opt_state_template,
                    stats_template):
    """Restore the full training state (same-phase resume). Templates only fix
    treedefs — capacity comes from the stored leaves, so a checkpoint written at
    any capacity restores into a template built at any other. Returns
    (field, opt_state, stats, step, spatial_lr_scale, active_sh_degree)."""
    data = np.load(path, allow_pickle=False)
    field = _unflatten_group(data, "field", field_template)
    opt_state = _unflatten_group(data, "opt", opt_state_template)
    stats = _unflatten_group(data, "stats", stats_template)
    return (field, opt_state, stats, int(data["__step"]),
            float(data["__spatial_lr_scale"]), int(data["__active_sh_degree"]))
