"""Real-weight integration runbook: verify SAM / CLIP / LPIPS backends.

This build environment has zero network egress, so the heavy model weights must
be provided locally. This script checks each backend end-to-end and falls back
to documented stand-ins so it always runs clean (VERDICT r01 #9).

Expected local weight layouts (HF `save_pretrained` directories):
  SAM   : a `facebook/sam-vit-huge`-compatible dir
          (config.json + model.safetensors + preprocessor_config.json)
  CLIP  : a `laion/CLIP-ViT-B-16-laion2B-s34b-b88k`-compatible dir
          (the open_clip ViT-B-16 laion2b_s34b_b88k weights the reference loads
          at /root/reference/preprocess.py:47-54, converted to HF format)
  LPIPS : torchvision backbone weights in $TORCH_HOME plus the richzhang lin
          weights (https://github.com/richzhang/PerceptualSimilarity
          lpips/weights/v0.1/alex.pth — the file the reference downloads at
          /root/reference/lpipsPyTorch/modules/utils.py:11-30)

Usage:
  python scripts/verify_backends.py                      # stand-ins only
  python scripts/verify_backends.py --clip /w/clip --sam /w/sam \
      --lpips_lin /w/alex.pth [--ref_embeds ref_clip_embeds.npz]

With --ref_embeds pointing at a stored reference vector set (written by a
previous run, or exported from the reference's open_clip on a CUDA machine via
the snippet in --help_export), the CLIP check asserts cosine agreement > 0.999
per vector — the numeric cross-check between transformers-CLIP and the
reference's open_clip.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# everything here is small host-side math; keep it off the tunneled TPU (the
# axon sitecustomize latches the platform before env vars can, so override
# through jax.config — see .claude/skills/verify gotcha #2)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

EXPORT_SNIPPET = '''
# run on a machine with open_clip + the laion2b weights to export the
# reference-side vectors for --ref_embeds:
import numpy as np, torch, open_clip
model, _, _ = open_clip.create_model_and_transforms(
    "ViT-B-16", pretrained="laion2b_s34b_b88k", precision="fp16")
tokenizer = open_clip.get_tokenizer("ViT-B-16")
prompts = ["object", "things", "stuff", "texture", "cup", "red apple"]
with torch.no_grad():
    t = model.encode_text(tokenizer(prompts))
    t = (t / t.norm(dim=-1, keepdim=True)).float().numpy()
rng = np.random.default_rng(0)
tiles = rng.uniform(size=(4, 3, 224, 224)).astype(np.float32)
mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])[None, :, None, None]
std = torch.tensor([0.26862954, 0.26130258, 0.27577711])[None, :, None, None]
with torch.no_grad():
    v = model.encode_image(((torch.from_numpy(tiles) - mean) / std).half())
    v = (v / v.norm(dim=-1, keepdim=True)).float().numpy()
np.savez("ref_clip_embeds.npz",
         **{f"text_{p}": t[i] for i, p in enumerate(prompts)},
         **{f"tile_{i}": v[i] for i in range(len(tiles))})
'''

TEST_PROMPTS = ["object", "things", "stuff", "texture", "cup", "red apple"]


def check_clip(clip_path: str | None, ref_embeds: str | None) -> dict:
    rng = np.random.default_rng(0)
    tiles = rng.uniform(size=(4, 3, 224, 224)).astype(np.float32)
    if not clip_path:
        print("[clip ] no --clip path: STAND-IN (random projection); real check "
              "skipped")
        proj = np.random.default_rng(1).normal(size=(3 * 224 * 224, 512))
        img_emb = tiles.reshape(4, -1) @ proj
        img_emb /= np.linalg.norm(img_emb, axis=-1, keepdims=True)
        return {"mode": "stand-in"}

    from langsplat_tpu.preprocess.backends import TransformersClipImageEncoder
    from langsplat_tpu.evaluation.clip_text import ClipTextEncoder

    img_enc = TransformersClipImageEncoder(clip_path)
    txt_enc = ClipTextEncoder(clip_path)
    img_emb = img_enc(tiles)
    img_emb = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)
    txt_emb = txt_enc(TEST_PROMPTS)
    print(f"[clip ] image embeds {img_emb.shape}, text embeds {txt_emb.shape}")
    assert img_emb.shape == (4, 512) and txt_emb.shape == (len(TEST_PROMPTS), 512)

    # sanity: "cup" and "red apple" must be more similar to each other than to
    # the canonical negatives on any real CLIP
    sim = txt_emb @ txt_emb.T
    assert sim[4, 5] > sim[4, 0], "text embedding sanity failed"

    if ref_embeds:
        ref = np.load(ref_embeds)
        worst = 1.0
        for i, p in enumerate(TEST_PROMPTS):
            if f"text_{p}" in ref:
                r = ref[f"text_{p}"]
                worst = min(worst, float(txt_emb[i] @ r / np.linalg.norm(r)))
        for i in range(4):
            if f"tile_{i}" in ref:
                r = ref[f"tile_{i}"]
                worst = min(worst, float(img_emb[i] @ r / np.linalg.norm(r)))
        print(f"[clip ] min cosine vs reference vectors: {worst:.6f}")
        assert worst > 0.999, (
            f"transformers-CLIP disagrees with the stored open_clip vectors "
            f"(min cos {worst:.4f}) — wrong weights or preprocessing drift")
    else:
        out = "clip_embeds_check.npz"
        np.savez(out,
                 **{f"text_{p}": txt_emb[i] for i, p in enumerate(TEST_PROMPTS)},
                 **{f"tile_{i}": img_emb[i] for i in range(4)})
        print(f"[clip ] wrote {out}; export the open_clip side with the snippet "
              f"in the module docstring and diff")
    return {"mode": "real"}


def check_lpips(lin_path: str | None) -> dict:
    from langsplat_tpu.utils import metrics

    rng = np.random.default_rng(2)
    a = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    try:
        lp = metrics.LPIPS("alex", weights_dir=lin_path)
        mode = "real-lin" if lin_path else "uniform-lin (NOT true LPIPS)"
    except RuntimeError as e:
        print(f"[lpips] backbone unavailable ({e}); distance math only")
        feats = [np.asarray(rng.normal(size=(c, 8, 8)), np.float32)
                 for c in (64, 192, 384, 256, 256)]
        import jax.numpy as jnp
        lin = [jnp.ones(f.shape[0]) / f.shape[0] for f in feats]
        d = float(metrics.lpips_distance(
            [jnp.asarray(f) for f in feats],
            [jnp.asarray(f + 0.1) for f in feats], lin))
        print(f"[lpips] stand-in distance {d:.4f}")
        return {"mode": "stand-in"}
    if lin_path:
        chans = [int(w.shape[0]) for w in lp.lin]
        assert chans == [64, 192, 384, 256, 256], \
            f"alexnet lin channels {chans} != [64,192,384,256,256]"
        print(f"[lpips] richzhang lin weights loaded, channels {chans}")
    d_same = lp(a, a)
    d_diff = lp(a, b)
    print(f"[lpips] d(a,a)={d_same:.5f} d(a,b)={d_diff:.5f} ({mode})")
    assert d_same < 1e-6 and d_diff > d_same
    return {"mode": mode}


def check_sam(sam_path: str | None) -> dict:
    from langsplat_tpu.preprocess.auto_mask import (AutoMaskConfig,
                                                    AutoMaskGenerator)
    from langsplat_tpu.preprocess.pipeline import create

    rng = np.random.default_rng(3)
    image = np.full((128, 160, 3), 80, np.uint8)
    image[30:70, 40:90] = (200, 40, 40)     # a "thing" for SAM to find
    image[80:110, 100:140] = (40, 200, 40)

    if sam_path:
        from langsplat_tpu.preprocess.backends import TransformersSamPredictor
        predictor = TransformersSamPredictor(sam_path)
        cfg = AutoMaskConfig(points_per_side=16, crop_n_layers=1)
        mode = "real"
    else:
        print("[sam  ] no --sam path: STAND-IN toy predictor")
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from tests.test_preprocess import ToyPredictor
        predictor = ToyPredictor()
        cfg = AutoMaskConfig(points_per_side=6, crop_n_layers=1,
                             stability_score_thresh=0.5, min_mask_region_area=0)
        mode = "stand-in"

    gen = AutoMaskGenerator(predictor, cfg)
    d, s, m, l = gen.generate(image)
    print(f"[sam  ] masks per head: default={len(d)} s={len(s)} m={len(m)} "
          f"l={len(l)} ({mode}, crop_n_layers=1)")
    assert len(d) > 0

    def fake_clip(tiles):
        e = np.random.default_rng(4).normal(size=(len(tiles), 512))
        return (e / np.linalg.norm(e, axis=-1, keepdims=True)).astype(np.float32)

    out_dir = "/tmp/verify_backends_out"
    os.makedirs(out_dir, exist_ok=True)
    create([image], ["probe.png"], out_dir, gen, fake_clip)
    seg = np.load(os.path.join(out_dir, "probe_s.npy"))
    feats = np.load(os.path.join(out_dir, "probe_f.npy"))
    assert seg.shape == (4, 128, 160) and feats.shape[1] == 512
    print(f"[sam  ] full preprocess contract ok: seg {seg.shape}, "
          f"feats {feats.shape}")
    return {"mode": mode}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--sam", type=str, default="")
    p.add_argument("--clip", type=str, default="")
    p.add_argument("--lpips_lin", type=str, default="",
                   help="richzhang alex.pth or converted npz of lin weights")
    p.add_argument("--ref_embeds", type=str, default="")
    p.add_argument("--help_export", action="store_true",
                   help="print the open_clip export snippet and exit")
    args = p.parse_args(argv)
    if args.help_export:
        print(EXPORT_SNIPPET)
        return

    r1 = check_clip(args.clip or None, args.ref_embeds or None)
    r2 = check_lpips(args.lpips_lin or None)
    r3 = check_sam(args.sam or None)
    print(f"\nall checks passed: clip={r1['mode']} lpips={r2['mode']} "
          f"sam={r3['mode']}")


if __name__ == "__main__":
    main()
