#!/usr/bin/env python
"""Mid-scale end-to-end QUALITY run on the chip -> QUALITY_r04.json.

Exercises the exact process.sh pipeline shape (reference `process.sh` +
`eval/eval.sh`) on a procedurally generated mid-scale scene with known semantics:

  scene    synthetic-COLMAP room: textured floor + K textured spheres, each object
           carrying a fixed 512-d "CLIP" embedding; GT images are renders of a
           ~110k-Gaussian GT field (self-consistency protocol: training must
           recover a field whose renders match at high PSNR from a noisy 28k-point
           SfM-like init).
  ae       scene-wise autoencoder 512->3 on the per-mask feature tables
           (autoencoder_cli train + test, reference autoencoder/train.py).
  oracle   eval protocol on AE-encoded GT feature maps (no training/rendering):
           the mIoU ceiling the trained field can approach.
  phaseA   RGB 3DGS with densification/opacity resets (train_cli, --eval split);
           the PSNR curve is parsed from the loop's test-iteration reports.
  phaseB   language features at levels 1..3 from the phase-A checkpoint.
  render   render_cli RGB (test split PSNR) + feature maps for the train split.
  evalrun  eval_cli -> LERF IoU/localization protocol against labelme GT derived
           from the GT object masks, with precomputed text embeddings
           (the object embedding table itself; negatives are fixed random vectors).
  report   QUALITY_r04.json at the repo root.

GT masks/annotations come from indicator-feature renders of the GT field: the
per-pixel blend weight of each object's Gaussians (3 channels per pass), argmaxed.

Smoke mode (--smoke, CPU): 2 objects, tiny images/iteration counts, interpret
backend — validates every stage end-to-end in a few minutes off-chip.
"""

import argparse
import contextlib
import glob
import io
import json
import os
import re
import struct
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# --------------------------------------------------------------------------
# configuration
# --------------------------------------------------------------------------

class P:
    """Run parameters (full-scale defaults; --smoke shrinks everything)."""
    scene = "synthroom"
    # reference protocol resolution class (README.md:58-59 trains at 1080p-class
    # after the -1 auto-downscale, utils/camera_utils.py:25-37)
    width, height = 960, 720
    focal = 900.0
    n_cams = 40
    n_objects = 6
    floor_pts = 40_000
    obj_pts = 12_000
    init_pts = 28_000
    embed_dim = 512
    # phase A at the reference iteration protocol
    # (/root/reference/arguments/__init__.py:76: 30k iters, densify until 15k)
    iters_a = 30_000
    densify_until = 15_000
    test_every = 2_500
    # Reference default (arguments/__init__.py:92). The round-3 death-spiral
    # investigation (28k -> 150 Gaussians: post-reset size-prune removing
    # grazing-angle floor splats with densification never arming) turned out
    # to be a UNITS bug, not a threshold problem: the reference accumulates
    # mean2D grads in half-image units (backward.cu scales by 0.5*W/0.5*H)
    # and 2e-4 is calibrated to those — fixed in train/densify.update_stats.
    densify_grad_threshold = 2e-4
    # phase B
    iters_b = 5_000
    # the synthetic per-object embeddings are near-orthogonal random 512-d
    # vectors — harder to compress to 3-d than real CLIP features, and the
    # GT-feature eval oracle only clears ~0.76 mIoU once the AE has fully
    # memorized the table (a 3-epoch AE collapses every code to one direction
    # and scores ~0); the table dataset is tiny so epochs are cheap
    ae_epochs = 400
    eval_frames = 5          # annotated train views
    interpret = False

    @classmethod
    def smoke(cls):
        cls.width, cls.height = 128, 96
        cls.focal = 120.0
        cls.n_cams = 10
        cls.n_objects = 2
        cls.floor_pts = 1_500
        cls.obj_pts = 600
        cls.init_pts = 800
        cls.iters_a = 60
        cls.densify_until = 40
        cls.test_every = 30
        cls.iters_b = 30
        cls.ae_epochs = 300
        cls.eval_frames = 2
        cls.interpret = True


PALETTE = np.array([
    [0.85, 0.25, 0.20], [0.20, 0.55, 0.85], [0.95, 0.80, 0.25],
    [0.30, 0.75, 0.35], [0.70, 0.35, 0.80], [0.90, 0.55, 0.20],
], np.float32)


def ws_path(ws, *parts):
    return os.path.join(ws, *parts)


def rotmat_to_qvec(R):
    """COLMAP (w, x, y, z) quaternion from a rotation matrix."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def look_at(pos, target, up=(0.0, 0.0, 1.0)):
    """World->cam rotation in COLMAP convention (x right, y down, z forward)."""
    f = np.asarray(target, np.float64) - np.asarray(pos, np.float64)
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    d = np.cross(f, r)
    return np.stack([r, d, f])


# --------------------------------------------------------------------------
# stage: scene
# --------------------------------------------------------------------------

def build_gt_geometry(rng):
    """Returns (means [N,3], colors [N,3], scales [N], labels [N], centers [K,3])."""
    k = P.n_objects
    # object centers on a ring over the floor
    ang = np.linspace(0, 2 * np.pi, k, endpoint=False) + 0.3
    rad = rng.uniform(0.9, 1.5, k)
    r_obj = rng.uniform(0.28, 0.42, k)
    centers = np.stack([rad * np.cos(ang), rad * np.sin(ang), r_obj + 0.02], axis=1)

    means, colors, scales, labels = [], [], [], []
    # floor: 6x6 plane at z=0 with a two-tone check + color wash (label 0)
    n = P.floor_pts
    xy = rng.uniform(-3, 3, (n, 2))
    z = np.zeros((n, 1))
    check = ((np.floor(xy[:, 0] / 0.5) + np.floor(xy[:, 1] / 0.5)) % 2)
    base = np.where(check[:, None] > 0, 0.62, 0.30)
    wash = 0.08 * np.stack([np.sin(2.1 * xy[:, 0]), np.sin(1.7 * xy[:, 1]),
                            np.cos(1.3 * (xy[:, 0] + xy[:, 1]))], axis=1)
    means.append(np.concatenate([xy, z], axis=1))
    colors.append(np.clip(base + wash, 0.02, 0.98))
    scales.append(np.full(n, 6.0 / np.sqrt(n) * 0.8))
    labels.append(np.zeros(n, np.int32))

    for i in range(k):                                     # labels 1..K: spheres
        n = P.obj_pts
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = centers[i] + r_obj[i] * v
        stripes = 0.20 * np.sin(9.0 * v[:, 2:3] + i) * np.array([[1, -0.6, 0.3]])
        col = np.clip(PALETTE[i % len(PALETTE)] + stripes
                      + rng.normal(0, 0.02, (n, 3)), 0.02, 0.98)
        means.append(pts)
        colors.append(col)
        scales.append(np.full(n, 2.2 * r_obj[i] / np.sqrt(n) * 2.2))
        labels.append(np.full(n, i + 1, np.int32))

    return (np.concatenate(means).astype(np.float32),
            np.concatenate(colors).astype(np.float32),
            np.concatenate(scales).astype(np.float32),
            np.concatenate(labels), centers)


def make_cameras():
    """Orbit poses: (qvecs, tvecs) world->cam, COLMAP convention."""
    target = np.array([0.0, 0.0, 0.25])
    qvecs, tvecs = [], []
    for i in range(P.n_cams):
        a = 2 * np.pi * i / P.n_cams
        elev = np.deg2rad(18 + 14 * np.sin(3.1 * a))
        radius = 4.1 + 0.3 * np.cos(2.3 * a)
        pos = target + radius * np.array(
            [np.cos(a) * np.cos(elev), np.sin(a) * np.cos(elev), np.sin(elev)])
        R = look_at(pos, target)
        qvecs.append(rotmat_to_qvec(R))
        tvecs.append(-R @ pos)
    return np.asarray(qvecs), np.asarray(tvecs)


def write_colmap(root, qvecs, tvecs, pts, rgb8):
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    w, h, f = P.width, P.height, P.focal
    with open(os.path.join(sparse, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 1, w, h))            # PINHOLE
        fh.write(struct.pack("<dddd", f, f, w / 2.0, h / 2.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(qvecs)))
        for i, (q, t) in enumerate(zip(qvecs, tvecs)):
            fh.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            fh.write(f"frame_{i + 1:05d}.png".encode() + b"\x00")
            fh.write(struct.pack("<Q", 2))
            fh.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(pts)))
        for i in range(len(pts)):
            fh.write(struct.pack("<QdddBBBd", i + 1, *pts[i], *rgb8[i], 0.5))
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<ii", 1, 0))


def gt_field(means, colors, scales, opacity=0.92):
    import jax.numpy as jnp
    from langsplat_tpu.core import sh as sh_lib
    from langsplat_tpu.core import transforms
    from langsplat_tpu.models.gaussian_field import GaussianField
    n = means.shape[0]
    return GaussianField(
        xyz=jnp.asarray(means),
        features_dc=sh_lib.rgb_to_sh(jnp.asarray(colors))[:, None, :],
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(scales))[:, None].repeat(3, axis=1),
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=transforms.inverse_sigmoid(
            jnp.full((n, 1), opacity, jnp.float32)),
        language_feature=None,
        alive=jnp.ones((n,), bool),
    )


def mask_to_polygons(mask):
    """Largest-contour polygons of a binary mask (labelme `segmentation`)."""
    import cv2
    contours, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    polys = []
    for c in sorted(contours, key=cv2.contourArea, reverse=True)[:3]:
        if cv2.contourArea(c) < 16:
            continue
        eps = 0.004 * cv2.arcLength(c, True)
        pts = cv2.approxPolyDP(c, eps, True)[:, 0, :]
        if len(pts) >= 3:
            polys.append(pts.astype(int).tolist())
    return polys


def stage_scene(ws):
    """Build the GT scene: COLMAP tree, GT renders, language features, eval GT."""
    import jax.numpy as jnp
    from dataclasses import replace as dc_replace
    from PIL import Image
    from langsplat_tpu.config import ModelConfig, PipelineConfig
    from langsplat_tpu.data import dataset as ds
    from langsplat_tpu.data.cameras import load_camera
    from langsplat_tpu.train.loop import render_full

    rng = np.random.default_rng(7)
    root = ws_path(ws, "scene")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    means, colors, scales, labels, centers = build_gt_geometry(rng)
    qvecs, tvecs = make_cameras()

    # SfM-like init: subsampled GT points + noise
    sel = rng.choice(len(means), size=min(P.init_pts, len(means)), replace=False)
    init_pts = means[sel] + rng.normal(0, 0.02, (len(sel), 3)).astype(np.float32)
    init_rgb = np.clip(colors[sel] + rng.normal(0, 0.05, (len(sel), 3)), 0, 1)
    write_colmap(root, qvecs, tvecs, init_pts, (init_rgb * 255).astype(np.uint8))

    # placeholder images so the reader can load, then render GT and overwrite
    ph = np.zeros((P.height, P.width, 3), np.uint8)
    for i in range(P.n_cams):
        Image.fromarray(ph).save(
            os.path.join(root, "images", f"frame_{i + 1:05d}.png"))

    info = ds.read_colmap_scene(root, "images", eval_split=False)
    cams = [load_camera(ci, 1.0, 1, uid=i)
            for i, ci in enumerate(info.train_cameras)]
    cams.sort(key=lambda c: c.image_name)

    # 960x720 tile rects need ~2x the 640x480 instance budget per Gaussian
    pipe = PipelineConfig(interpret=P.interpret, budget_factor=16)
    field = gt_field(means, colors, scales)
    bg = jnp.zeros(3)

    n_lab = P.n_objects + 1
    n_pass = -(-n_lab // 3)
    os.makedirs(ws_path(ws, "gt_masks"), exist_ok=True)
    lf_dir = os.path.join(root, "language_features")
    os.makedirs(lf_dir, exist_ok=True)

    # hierarchical 512-d embedding table (the "CLIP" table): objects, 2 parts
    # per object (z halves), 4 subparts per part... noise scales chosen so a
    # child correlates with its parent (cos ~0.5/0.6 — real CLIP crops of a
    # part resemble the object) yet every level is clearly distinct: the
    # best-of-levels eval selection must pick level 2 for part prompts and
    # level 3 for whole-object prompts (VERDICT r03 #4a: the previous scene
    # emitted duplicate m/l levels, leaving that mechanism untested)
    embeds = rng.normal(size=(n_lab, P.embed_dim)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    part_embeds = []
    for k in range(n_lab):
        for half in range(2):
            e = embeds[k] + 0.08 * rng.normal(size=P.embed_dim).astype(np.float32)
            part_embeds.append(e / np.linalg.norm(e))
    part_embeds = np.asarray(part_embeds, np.float32)
    sub_embeds = []
    for pid in range(2 * n_lab):
        for q in range(2):
            e = (part_embeds[pid]
                 + 0.06 * rng.normal(size=P.embed_dim).astype(np.float32))
            sub_embeds.append(e / np.linalg.norm(e))
    sub_embeds = np.asarray(sub_embeds, np.float32)
    # part id per gaussian: 2*label + (above object-center z); subpart id:
    # 2*part + (right of object-center x) — 4 per object
    zc = np.where(labels > 0, centers[np.maximum(labels - 1, 0), 2], 0.0)
    xc = np.where(labels > 0, centers[np.maximum(labels - 1, 0), 0], 0.0)
    part_of_gauss = 2 * labels + (means[:, 2] > zc).astype(np.int32)
    sub_of_gauss = 2 * part_of_gauss + (means[:, 0] > xc).astype(np.int32)

    t0 = time.time()
    for i, cam in enumerate(cams):
        out = render_full(field, cam, pipe, 0, False, bg)
        img = np.asarray(out["render"]).transpose(1, 2, 0)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(root, "images", f"{cam.image_name}.png"))

        # indicator renders -> per-pixel object weights (whole objects)
        wts = []
        for p in range(n_pass):
            ind = np.zeros((len(labels), 3), np.float32)
            for c in range(3):
                lab = p * 3 + c
                if lab < n_lab:
                    ind[:, c] = (labels == lab)
            f2 = dc_replace(field, language_feature=jnp.asarray(ind))
            o2 = render_full(f2, cam, pipe, 0, True, bg)
            wts.append(np.asarray(o2["language_feature_image"]))
        wts = np.concatenate(wts, axis=0)[:n_lab]           # [n_lab, H, W]
        total = wts.sum(axis=0)
        seg_obj = np.where(total > 0.5, np.argmax(wts, axis=0), -1)

        # part-level weights (level "s"): only split foreground objects
        pw = []
        for p in range(-(-2 * n_lab // 3)):
            ind = np.zeros((len(labels), 3), np.float32)
            for c in range(3):
                pid = p * 3 + c
                if pid < 2 * n_lab:
                    ind[:, c] = (part_of_gauss == pid)
            f2 = dc_replace(field, language_feature=jnp.asarray(ind))
            o2 = render_full(f2, cam, pipe, 0, True, bg)
            pw.append(np.asarray(o2["language_feature_image"]))
        pw = np.concatenate(pw, axis=0)[:2 * n_lab]
        seg_part = np.where(total > 0.5, np.argmax(pw, axis=0), -1)

        # subpart-level weights (level "s"): 4 per object
        sw = []
        for p in range(-(-4 * n_lab // 3)):
            ind = np.zeros((len(labels), 3), np.float32)
            for c in range(3):
                sid = p * 3 + c
                if sid < 4 * n_lab:
                    ind[:, c] = (sub_of_gauss == sid)
            f2 = dc_replace(field, language_feature=jnp.asarray(ind))
            o2 = render_full(f2, cam, pipe, 0, True, bg)
            sw.append(np.asarray(o2["language_feature_image"]))
        sw = np.concatenate(sw, axis=0)[:4 * n_lab]
        seg_sub = np.where(total > 0.5, np.argmax(sw, axis=0), -1)

        np.save(ws_path(ws, "gt_masks", f"{cam.image_name}.npy"), seg_obj)
        np.save(ws_path(ws, "gt_masks", f"{cam.image_name}_part.npy"), seg_part)

        # language_features: seg levels [default, s, m, l] — three DISTINCT
        # trained granularities (1=subparts, 2=parts, 3=objects); the feature
        # table rows are [object (n_lab) | part (2*n_lab) | subpart (4*n_lab)]
        # embeds with small per-view noise (preprocess.py's per-crop variation)
        seg4 = np.stack([seg_obj,
                         np.where(seg_sub >= 0, seg_sub + 3 * n_lab, -1),
                         np.where(seg_part >= 0, seg_part + n_lab, -1),
                         seg_obj]).astype(np.int32)
        table = np.concatenate([embeds, part_embeds, sub_embeds], axis=0)
        table = table + 0.01 * rng.normal(size=table.shape).astype(np.float32)
        table /= np.linalg.norm(table, axis=1, keepdims=True)
        np.save(os.path.join(lf_dir, f"{cam.image_name}_s.npy"), seg4)
        np.save(os.path.join(lf_dir, f"{cam.image_name}_f.npy"),
                table.astype(np.float16))
        if i % 8 == 0:
            print(f"  GT render {i + 1}/{len(cams)} ({time.time() - t0:.0f}s)",
                  flush=True)

    # eval GT: labelme jsons for a few TRAIN-split views (llffhold=8 -> train
    # positions exclude every 8th reader-order index)
    train_positions = [i for i in range(P.n_cams) if i % 8 != 0]
    picks = np.linspace(0, len(train_positions) - 1, P.eval_frames).astype(int)
    json_dir = ws_path(ws, "label", P.scene)
    os.makedirs(json_dir, exist_ok=True)
    cat_names = ["floor"] + [f"sphere_{i}" for i in range(P.n_objects)]
    # part-level prompts for the first two spheres: their GT lives at the PART
    # granularity, so best-of-levels selection must pick level 2 for them and
    # level 3 for whole objects — `chosen_levels` in the artifact proves it
    part_cats = {}
    for i in range(min(2, P.n_objects)):
        for half, hn in ((0, "bottom"), (1, "top")):
            part_cats[f"sphere_{i}_{hn}"] = 2 * (i + 1) + half
    for tp in picks:
        reader_idx = train_positions[tp]
        cam = cams[reader_idx]
        seg_obj = np.load(ws_path(ws, "gt_masks", f"{cam.image_name}.npy"))
        seg_part = np.load(ws_path(ws, "gt_masks", f"{cam.image_name}_part.npy"))
        objects = []
        for lab in range(n_lab):
            m = (seg_obj == lab).astype(np.uint8)
            if m.sum() < 64:
                continue
            ys, xs = np.nonzero(m)
            bbox = [int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())]
            for poly in mask_to_polygons(m):
                objects.append({"category": cat_names[lab], "bbox": bbox,
                                "segmentation": poly})
        for cat, pid in part_cats.items():
            m = (seg_part == pid).astype(np.uint8)
            if m.sum() < 64:
                continue
            ys, xs = np.nonzero(m)
            bbox = [int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())]
            for poly in mask_to_polygons(m):
                objects.append({"category": cat, "bbox": bbox,
                                "segmentation": poly})
        jd = {"info": {"name": f"frame_{tp + 1:05d}.jpg",
                       "height": P.height, "width": P.width},
              "objects": objects}
        with open(os.path.join(json_dir, f"frame_{tp + 1:05d}.json"), "w") as fh:
            json.dump(jd, fh)
        Image.open(os.path.join(root, "images", f"{cam.image_name}.png")) \
            .save(os.path.join(json_dir, f"frame_{tp + 1:05d}.jpg"))

    # precomputed text embeddings: categories + the relevancy negatives
    from langsplat_tpu.evaluation.relevancy import NEGATIVE_PROMPTS
    neg = rng.normal(size=(len(NEGATIVE_PROMPTS), P.embed_dim)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=1, keepdims=True)
    table = {cat_names[i]: embeds[i] for i in range(n_lab)}
    table.update({cat: part_embeds[pid] for cat, pid in part_cats.items()})
    table.update({p: neg[i] for i, p in enumerate(NEGATIVE_PROMPTS)})
    np.savez(ws_path(ws, "text_embeddings.npz"), **table)
    print(f"scene stage done in {time.time() - t0:.0f}s: "
          f"{len(means)} GT gaussians, {P.n_cams} cams", flush=True)


# --------------------------------------------------------------------------
# training / eval stages
# --------------------------------------------------------------------------

class Tee(io.TextIOBase):
    def __init__(self, *sinks):
        self.sinks = sinks

    def write(self, s):
        for k in self.sinks:
            k.write(s)
            k.flush()
        return len(s)


def run_logged(fn, argv, log_path):
    # "w", not "a": round 3's published psnr_curve silently interleaved three
    # training attempts because a reused workspace appended — each attempt now
    # owns its log (every stage/level writes a distinct file)
    with open(log_path, "w") as fh:
        with contextlib.redirect_stdout(Tee(sys.stdout, fh)):
            fn(argv)


def common_pipe_flags():
    # the smoke scene is tiny (few hundred Gaussians over many tiles), so its
    # instances-per-Gaussian ratio far exceeds the full-scale default cap;
    # at the 960x720 protocol resolution the full-scale rects are ~2x the
    # 640x480 ones per Gaussian, hence 14
    flags = ["--budget_factor", "32" if P.interpret else "14"]
    if P.interpret:
        flags.append("--interpret")
    return flags


def stage_ae(ws):
    from langsplat_tpu.cli.autoencoder_cli import test_main, train_main
    root = ws_path(ws, "scene")
    train_main(["--dataset_path", root, "--dataset_name", P.scene,
                "--ckpt_root", ws_path(ws, "ckpt"),
                "--num_epochs", str(P.ae_epochs)])
    test_main(["--dataset_path", root, "--dataset_name", P.scene,
               "--ckpt_root", ws_path(ws, "ckpt")])


def stage_phase_a(ws):
    from langsplat_tpu.cli.train_cli import main as train_main
    root = ws_path(ws, "scene")
    out = ws_path(ws, "output", P.scene)
    tests = list(range(P.test_every, P.iters_a + 1, P.test_every))
    argv = ["-s", root, "-m", out, "--no_include_feature", "--eval",
            "--resolution", "1",
            "--iterations", str(P.iters_a),
            "--densify_until_iter", str(P.densify_until),
            "--densify_grad_threshold", str(P.densify_grad_threshold),
            # headroom for densification growth (GT field is 112k) without
            # paying a remote-recompile per geometric capacity growth
            "--initial_capacity_factor", "6",
            "--test_iterations"] + [str(t) for t in tests] + [
            "--save_iterations", str(P.iters_a),
            "--checkpoint_iterations", str(P.iters_a)] + common_pipe_flags()
    if P.interpret:
        argv += ["--densify_from_iter", "10", "--densification_interval", "10",
                 "--opacity_reset_interval", "30"]
    run_logged(train_main, argv, ws_path(ws, "phaseA.log"))


def stage_phase_b(ws):
    from langsplat_tpu.cli.train_cli import main as train_main
    root = ws_path(ws, "scene")
    out = ws_path(ws, "output", P.scene)
    ck = f"{out}_-1/chkpnt{P.iters_a}.npz"
    for lvl in (1, 2, 3):
        argv = ["-s", root, "-m", out, "--eval", "--resolution", "1",
                "--feature_level", str(lvl),
                "--iterations", str(P.iters_b),
                "--start_checkpoint", ck,
                "--test_iterations", str(P.iters_b),
                "--save_iterations", str(P.iters_b),
                "--checkpoint_iterations", str(P.iters_b)] + common_pipe_flags()
        run_logged(train_main, argv, ws_path(ws, f"phaseB_{lvl}.log"))


def stage_render(ws):
    from langsplat_tpu.cli.render_cli import main as render_main
    out = ws_path(ws, "output", P.scene)
    render_main(["-m", f"{out}_-1", "--skip_train"] + common_pipe_flags())
    for lvl in (1, 2, 3):
        render_main(["-m", f"{out}_{lvl}", "--include_feature", "--skip_test"]
                    + common_pipe_flags())


def stage_eval(ws):
    from langsplat_tpu.cli.eval_cli import main as eval_main
    res = eval_main(["--dataset_name", P.scene,
                     "--feat_dir", ws_path(ws, "output"),
                     "--ae_ckpt_dir", ws_path(ws, "ckpt"),
                     "--json_folder", ws_path(ws, "label"),
                     "--output_dir", ws_path(ws, "eval_result"),
                     "--iteration", str(P.iters_b),
                     "--text_embeddings", ws_path(ws, "text_embeddings.npz")])
    with open(ws_path(ws, "eval_result.json"), "w") as fh:
        json.dump({k: v for k, v in res.items() if k != "chosen_levels"}
                  | {"chosen_levels": [int(x) for x in res["chosen_levels"]]}, fh)
    print("eval:", res)


def stage_oracle(ws):
    """Eval-path sanity ceiling: run the LERF IoU/loc protocol on GT feature
    maps (the scene's own 512-d per-pixel features AE-encoded to 3-d), skipping
    training and rendering entirely. The resulting mIoU is the ceiling the
    trained field can approach — it isolates AE compression + eval protocol
    from field quality. Writes eval_oracle.json (the ~0.76 number cited in the
    parameter comments above, now reproducible as a stage)."""
    import jax
    import jax.numpy as jnp
    from langsplat_tpu.cli.autoencoder_cli import load_ae_checkpoint
    from langsplat_tpu.cli.eval_cli import main as eval_main
    from langsplat_tpu.models.autoencoder import init_autoencoder

    root = ws_path(ws, "scene")
    lf_dir = os.path.join(root, "language_features")
    ae_ckpt = ws_path(ws, "ckpt", P.scene, "best_ckpt.npz")
    model, variables = init_autoencoder(jax.random.key(0),
                                        [256, 128, 64, 32, 3],
                                        [16, 32, 64, 128, 256, 256, 512])
    variables = load_ae_checkpoint(ae_ckpt, variables)

    @jax.jit
    def encode(x):
        return model.apply(variables, x, train=False, method="encode")

    # annotated frame indices are TRAIN-SPLIT positions (stage_scene writes
    # label/frame_{tp+1:05d}.json for split position tp); eval indexes the
    # sorted renders_npy list by that position, so every position up to the
    # max must exist — unannotated ones are zeros (never read)
    train_positions = [i for i in range(P.n_cams) if i % 8 != 0]
    annotated = set()
    for jp in glob.glob(ws_path(ws, "label", P.scene, "frame_*.json")):
        annotated.add(int(os.path.basename(jp)[6:11]) - 1)

    for lvl in (1, 2, 3):
        out_dir = ws_path(ws, "eval_oracle", "output", f"{P.scene}_{lvl}",
                          "train", "ours_None", "renders_npy")
        os.makedirs(out_dir, exist_ok=True)
        for tp in range(len(train_positions)):
            path = os.path.join(out_dir, f"{tp:05d}.npy")
            if tp not in annotated:
                np.save(path, np.zeros((P.height, P.width, 3), np.float16))
                continue
            name = f"frame_{train_positions[tp] + 1:05d}"
            seg4 = np.load(os.path.join(lf_dir, name + "_s.npy"))
            table = np.load(os.path.join(lf_dir, name + "_f.npy")).astype(
                np.float32)
            codes = np.asarray(encode(jnp.asarray(table)))   # [M, 3]
            seg = seg4[lvl].astype(np.int64)
            feat3 = codes[np.clip(seg, 0, len(codes) - 1)]
            feat3[seg < 0] = 0.0
            np.save(path, feat3.astype(np.float16))          # [H, W, 3]

    res = eval_main(["--dataset_name", P.scene,
                     "--feat_dir", ws_path(ws, "eval_oracle", "output"),
                     "--ae_ckpt_dir", ws_path(ws, "ckpt"),
                     "--json_folder", ws_path(ws, "label"),
                     "--output_dir", ws_path(ws, "eval_oracle", "result"),
                     "--no_vis",
                     "--text_embeddings", ws_path(ws, "text_embeddings.npz")])
    with open(ws_path(ws, "eval_oracle.json"), "w") as fh:
        json.dump({"miou": res["miou"],
                   "localization_acc": res["localization_acc"]}, fh)
    print("eval oracle:", res["miou"], res["localization_acc"])


def stage_report(ws, out_path):
    # PSNR curve from the phase-A log
    curve = []
    pat = re.compile(r"\[ITER (\d+)\] Evaluating (\w+): L1 ([\d.eE+-]+) "
                     r"PSNR ([\d.eE+-]+)")
    with open(ws_path(ws, "phaseA.log")) as fh:
        for line in fh:
            m = pat.search(line)
            if m and m.group(2) == "test":
                curve.append({"iter": int(m.group(1)),
                              "psnr": float(m.group(4)),
                              "l1": float(m.group(3))})
    # final test PSNR from the rendered test split
    out = ws_path(ws, "output", f"{P.scene}_-1", "test")
    ours = sorted(glob.glob(os.path.join(out, "ours_*")))[-1]
    psnrs = []
    for rp in sorted(glob.glob(os.path.join(ours, "renders_npy", "*.npy"))):
        gp = os.path.join(ours, "gt_npy", os.path.basename(rp))
        r, g = np.load(rp), np.load(gp)
        mse = float(np.mean((r - g) ** 2))
        psnrs.append(-10 * np.log10(max(mse, 1e-12)))
    with open(ws_path(ws, "eval_result.json")) as fh:
        ev = json.load(fh)
    # feature-phase final masked feature-channel L1 per level, from the loop's
    # feature-L1 test lines (loop.evaluate_psnr's include_feature branch) — the
    # RGB "L1" lines are constant in phase B (geometry frozen) and must NOT be
    # reported as feature numbers
    fpat = re.compile(r"\[ITER (\d+)\] Evaluating (\w+): feature-L1 "
                      r"([\d.eE+-]+)")
    feat_l1 = {}
    for lvl in (1, 2, 3):
        try:
            with open(ws_path(ws, f"phaseB_{lvl}.log")) as fh:
                vals = [float(m.group(3)) for m in
                        (fpat.search(x) for x in fh)
                        if m and m.group(2) == "test"]
            if vals:
                feat_l1[str(lvl)] = vals[-1]
        except FileNotFoundError:
            pass
    oracle = None
    try:
        with open(ws_path(ws, "eval_oracle.json")) as fh:
            oracle = json.load(fh)
    except FileNotFoundError:
        pass
    ply = ws_path(ws, "output", f"{P.scene}_-1", "point_cloud",
                  f"iteration_{P.iters_a}", "point_cloud.ply")
    n_final = None
    if os.path.exists(ply):
        from langsplat_tpu.models import field_io
        n_final = int(field_io.load_ply(ply).num_alive)
    # densification trajectory (clone/split vs prune dynamics around opacity
    # resets) from the progress lines: proves the grow path fired at scale
    # even when size-pruning brings the final count back near the init
    npat = re.compile(r"iter (\d+): \S+ n=(\d+)")
    traj = {}
    try:
        with open(ws_path(ws, "phaseA.log")) as fh:
            for line in fh:
                m = npat.search(line)
                if m:
                    traj[int(m.group(1))] = int(m.group(2))
    except FileNotFoundError:
        pass  # partial workspace (e.g. --stages render,evalrun,report)
    n_curve = [{"iter": it, "n": traj[it]}
               for it in sorted(traj) if it % 500 == 0 or it == max(traj)] \
        if traj else []
    n_peak = max(traj.values()) if traj else None
    report = {
        "protocol": "self-consistency synthetic-COLMAP scene, full "
                    "process.sh-shaped pipeline (AE 512->3, phase A RGB with "
                    "densification, phase B levels 1-3, render, LERF IoU/loc eval)",
        "scene": {"gaussians_gt": P.floor_pts + P.n_objects * P.obj_pts,
                  "init_points": P.init_pts, "cameras": P.n_cams,
                  "image": [P.width, P.height], "objects": P.n_objects + 1,
                  "gaussians_final": n_final, "gaussians_peak": n_peak,
                  "gaussians_curve": n_curve},
        "phase_a": {"iterations": P.iters_a, "psnr_curve": curve,
                    "final_test_psnr_mean": float(np.mean(psnrs)) if psnrs else None,
                    "final_test_psnr_per_view": [round(p, 3) for p in psnrs]},
        "phase_b": {"iterations": P.iters_b, "final_test_feature_l1": feat_l1},
        "eval": ev,
        "eval_oracle": oracle,
        "device": os.environ.get("JAX_PLATFORMS", "tpu"),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"final_test_psnr": report["phase_a"]["final_test_psnr_mean"],
                      "miou": ev.get("miou"),
                      "localization_acc": ev.get("localization_acc"),
                      "oracle_miou": oracle.get("miou") if oracle else None}))


STAGES = ["scene", "ae", "oracle", "phaseA", "phaseB", "render", "evalrun",
          "report"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ws", default=os.path.join(REPO, ".quality_ws"))
    ap.add_argument("--stages", default=",".join(STAGES))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-interpret run of every stage")
    ap.add_argument("--report_path", default=os.path.join(REPO,
                                                          "QUALITY_r04.json"))
    args = ap.parse_args()

    if args.smoke:
        P.smoke()
        args.ws = args.ws + "_smoke"
        args.report_path = os.path.join(args.ws, "QUALITY_smoke.json")
    os.makedirs(args.ws, exist_ok=True)

    import jax
    if args.smoke:
        # the JAX_PLATFORMS env var is silently ignored in this image (the axon
        # sitecustomize pins the tunneled chip); force CPU inside the process
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    todo = args.stages.split(",")
    t0 = time.time()
    # chip-contention lock: bench.py refuses to publish a clean number while any
    # live .quality_ws*/RUNNING exists (round 3's BENCH_r03.json was silently
    # contaminated by a concurrent quality-run eval on the same chip).  A
    # --smoke run is forced to CPU and does not touch the chip, so it must NOT
    # drop a lock (ADVICE r4: a smoke replay falsely tainted bench artifacts).
    lock = os.path.join(args.ws, "RUNNING") if not args.smoke else None
    if lock:
        with open(lock, "w") as fh:
            fh.write(f"pid={os.getpid()} t0={t0:.0f} stages={args.stages}\n")
    # Per-stage wall-clock records (weak r04 #6: two rounds collided with a
    # monolithic multi-hour run whose stage costs were never written down).
    # stage_times.json accumulates measured durations; at startup the known
    # costs of the stages still to run are summed into a printed ETA so the
    # operator can budget the round (and split with --stages deliberately).
    times_path = os.path.join(args.ws, "stage_times.json")
    stage_times = {}
    try:
        with open(times_path) as fh:
            stage_times = json.load(fh)
    except (OSError, json.JSONDecodeError):
        pass
    known = [st for st in todo if st in stage_times]
    if known:
        eta = sum(stage_times[st] for st in known)
        print(f"ETA (recorded stages {','.join(known)}): {eta / 60:.0f} min; "
              f"unrecorded: {','.join(st for st in todo if st not in known) or 'none'}",
              flush=True)
    try:
        for st in todo:
            print(f"=== stage {st} ===", flush=True)
            st_t0 = time.time()
            if st == "scene":
                stage_scene(args.ws)
            elif st == "ae":
                stage_ae(args.ws)
            elif st == "oracle":
                stage_oracle(args.ws)
            elif st == "phaseA":
                stage_phase_a(args.ws)
            elif st == "phaseB":
                stage_phase_b(args.ws)
            elif st == "render":
                stage_render(args.ws)
            elif st == "evalrun":
                stage_eval(args.ws)
            elif st == "report":
                stage_report(args.ws, args.report_path)
            stage_times[st] = round(time.time() - st_t0, 1)
            try:
                with open(times_path, "w") as fh:
                    json.dump(stage_times, fh, indent=1)
            except OSError:
                pass
            print(f"=== {st} done ({stage_times[st]:.0f}s stage, "
                  f"{time.time() - t0:.0f}s elapsed) ===", flush=True)
    finally:
        if lock:
            try:
                os.remove(lock)
            except FileNotFoundError:
                pass


if __name__ == "__main__":
    main()
