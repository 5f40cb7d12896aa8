"""CLIP text encoder for eval prompts (gated on transformers + local weights).

The reference uses open_clip ViT-B-16 laion2b_s34b_b88k (`/root/reference/eval/
openclip_encoder.py:18-39`). Equivalent weights load through HF transformers as
`laion/CLIP-ViT-B-16-laion2B-s34b-b88k`. This environment has no network egress, so the
encoder accepts a local path; tests and offline runs can instead provide precomputed
embeddings (npz {prompt: [512]}) via `PrecomputedTextEncoder`.
"""

from __future__ import annotations

import numpy as np

DEFAULT_MODEL = "laion/CLIP-ViT-B-16-laion2B-s34b-b88k"


class ClipTextEncoder:
    """encode(list[str]) -> [K, 512] L2-normalized embeddings (torch cpu backend)."""

    def __init__(self, model_name_or_path: str = DEFAULT_MODEL):
        try:
            from transformers import CLIPModel, CLIPTokenizer
        except ImportError as e:
            raise RuntimeError("transformers unavailable; use "
                               "PrecomputedTextEncoder instead") from e
        self.model = CLIPModel.from_pretrained(model_name_or_path)
        self.tokenizer = CLIPTokenizer.from_pretrained(model_name_or_path)
        self.model.eval()

    def __call__(self, prompts: list[str]) -> np.ndarray:
        import torch
        with torch.no_grad():
            tokens = self.tokenizer(prompts, padding=True, return_tensors="pt")
            feats = self.model.get_text_features(**tokens)
            feats = feats / feats.norm(dim=-1, keepdim=True)
        return feats.numpy().astype(np.float32)


class PrecomputedTextEncoder:
    """Offline text "encoder" backed by an npz of {prompt: [D]} embeddings."""

    def __init__(self, npz_path: str | None = None, table: dict | None = None):
        if table is None:
            data = np.load(npz_path)
            table = {k: data[k] for k in data.files}
        self.table = {k: np.asarray(v, np.float32) for k, v in table.items()}

    def __call__(self, prompts: list[str]) -> np.ndarray:
        missing = [p for p in prompts if p not in self.table]
        if missing:
            raise KeyError(f"no precomputed embeddings for {missing}")
        out = np.stack([self.table[p] for p in prompts])
        return out / (np.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
