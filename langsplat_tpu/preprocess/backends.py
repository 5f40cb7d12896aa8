"""Gated SAM / CLIP model backends for the preprocessing pipeline.

The reference uses the segment-anything-langsplat fork of SAM ViT-H plus open_clip
ViT-B-16 laion2b (`/root/reference/preprocess.py:8,47-54,362-372`). Here both load through
HF transformers from LOCAL weight paths (this build environment has no network egress):
  - SAM:  `facebook/sam-vit-huge`-compatible checkpoints via SamModel/SamProcessor;
  - CLIP: `laion/CLIP-ViT-B-16-laion2B-s34b-b88k`-compatible via CLIPModel.

Any other implementation of the two callables works — the pipeline only needs
`predictor(image, points) -> (masks, iou_preds, logits)` and `encode(tiles) -> embeds`.
"""

from __future__ import annotations

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class TransformersSamPredictor:
    """predictor(image [H,W,3] uint8, points [P,2] xy pixels) ->
    (masks [P,3,H,W] bool, iou_preds [P,3], logits [P,3,H,W])."""

    def __init__(self, model_name_or_path: str = "facebook/sam-vit-huge",
                 device: str = "cpu"):
        try:
            from transformers import SamModel, SamProcessor
        except ImportError as e:
            raise RuntimeError("transformers unavailable") from e
        self.model = SamModel.from_pretrained(model_name_or_path).to(device).eval()
        self.processor = SamProcessor.from_pretrained(model_name_or_path)
        self.device = device

    def __call__(self, image: np.ndarray, points: np.ndarray):
        import torch
        h, w = image.shape[:2]
        input_points = [[[list(map(float, p))] for p in points]]
        inputs = self.processor(image, input_points=input_points,
                                return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self.model(**inputs, multimask_output=True)
        logits = self.processor.image_processor.post_process_masks(
            out.pred_masks.cpu(), inputs["original_sizes"].cpu(),
            inputs["reshaped_input_sizes"].cpu(), binarize=False)[0]
        logits = logits.numpy()                       # [P, 3, H, W]
        iou = out.iou_scores[0].cpu().numpy()         # [P, 3]
        return logits > 0.0, iou, logits


class TransformersClipImageEncoder:
    """encode(tiles [M,3,224,224] float in [0,1]) -> [M, 512] embeddings."""

    def __init__(self,
                 model_name_or_path: str = "laion/CLIP-ViT-B-16-laion2B-s34b-b88k",
                 device: str = "cpu", batch_size: int = 64):
        try:
            from transformers import CLIPModel
        except ImportError as e:
            raise RuntimeError("transformers unavailable") from e
        self.model = CLIPModel.from_pretrained(model_name_or_path).to(device).eval()
        self.device = device
        self.batch_size = batch_size

    def __call__(self, tiles: np.ndarray) -> np.ndarray:
        import torch
        normed = (tiles - CLIP_MEAN[None, :, None, None]) / \
            CLIP_STD[None, :, None, None]
        outs = []
        with torch.no_grad():
            for i in range(0, len(normed), self.batch_size):
                batch = torch.from_numpy(normed[i:i + self.batch_size]).to(self.device)
                outs.append(self.model.get_image_features(
                    pixel_values=batch).cpu().numpy())
        return np.concatenate(outs, axis=0)
