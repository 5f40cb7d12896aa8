"""Image quality metrics: PSNR/SSIM re-exports + LPIPS.

LPIPS mirrors the reference's vendored `lpipsPyTorch` (component P16, SURVEY.md §2.2 —
present but unused by the reference's scripts): normalized deep features from a backbone,
per-layer 1x1 "lin" weighting, spatially averaged and summed. The torch backbone +
richzhang lin weights need local files (no egress here), so construction is gated; the
distance math itself is jnp and unit-tested against its definition.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from langsplat_tpu.core.losses import psnr, ssim  # re-export  # noqa: F401

_IMAGENET_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_IMAGENET_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def normalize_tensor(feats: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Unit-normalize over the channel axis (richzhang normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(feats ** 2, axis=-3, keepdims=True))
    return feats / (norm + eps)


def lpips_distance(feats_a: list[jnp.ndarray], feats_b: list[jnp.ndarray],
                   lin_weights: list[jnp.ndarray]) -> jnp.ndarray:
    """LPIPS from per-layer features [C,H,W] and lin weights [C] (non-negative)."""
    total = 0.0
    for fa, fb, w in zip(feats_a, feats_b, lin_weights):
        diff = (normalize_tensor(fa) - normalize_tensor(fb)) ** 2
        weighted = jnp.sum(jnp.maximum(w, 0.0)[:, None, None] * diff, axis=-3)
        total = total + jnp.mean(weighted, axis=(-2, -1))
    return total


def scale_image_for_lpips(image: jnp.ndarray) -> jnp.ndarray:
    """[3,H,W] in [0,1] -> ImageNet-shifted input the LPIPS backbones expect."""
    x = image * 2.0 - 1.0
    return (x - jnp.asarray(_IMAGENET_SHIFT)[:, None, None]) / \
        jnp.asarray(_IMAGENET_SCALE)[:, None, None]


def load_richzhang_lin(weights_path: str) -> list[jnp.ndarray]:
    """Load per-layer lin weights from a richzhang lpips/weights/v0.1/<net>.pth
    state dict (lin{i}.model.1.weight tensors of shape [1, C, 1, 1], in layer
    order — `/root/reference/lpipsPyTorch/modules/utils.py:11-30`) or an npz."""
    if weights_path.endswith((".pth", ".pt")):
        import torch
        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        keys = sorted((k for k in sd if k.endswith(".weight")),
                      key=lambda k: int(k.split(".")[0][3:]))
        if not keys:
            raise ValueError(f"no lin weights in {weights_path}")
        return [jnp.asarray(np.asarray(sd[k]).reshape(-1)) for k in keys]
    data = np.load(weights_path)
    return [jnp.asarray(data[k]) for k in sorted(data.files)]


class LPIPS:
    """LPIPS metric with a torch backbone (gated on local torchvision weights).

    net_type in {"alex", "vgg", "squeeze"} as in
    `/root/reference/lpipsPyTorch/modules/lpips.py:8-36`.
    """

    def __init__(self, net_type: str = "alex", weights_dir: str | None = None,
                 allow_uniform_lin: bool = False):
        self.allow_uniform_lin = allow_uniform_lin
        import torch
        try:
            import torchvision.models as tvm
        except ImportError as e:
            raise RuntimeError("torchvision unavailable in this image; LPIPS "
                               "needs its backbone weights") from e
        self.torch = torch
        factory = {"alex": tvm.alexnet, "vgg": tvm.vgg16,
                   "squeeze": tvm.squeezenet1_1}[net_type]
        try:
            net = factory(weights="DEFAULT")
        except Exception as e:
            raise RuntimeError(
                "torchvision backbone weights unavailable offline; pass tensors "
                "through lpips_distance with your own features instead") from e
        self.features = net.features.eval()
        self.slices = {"alex": (2, 5, 8, 10, 12), "vgg": (4, 9, 16, 23, 30),
                       "squeeze": (2, 5, 8, 10, 11, 12, 13)}[net_type]
        self.lin = load_richzhang_lin(weights_dir) if weights_dir else None

    def extract(self, image: np.ndarray) -> list[jnp.ndarray]:
        torch = self.torch
        x = torch.from_numpy(np.asarray(scale_image_for_lpips(jnp.asarray(image))))
        x = x[None]
        feats = []
        with torch.no_grad():
            h = x
            prev = 0
            for end in self.slices:
                for layer in list(self.features)[prev:end]:
                    h = layer(h)
                feats.append(jnp.asarray(h[0].numpy()))
                prev = end
        return feats

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> float:
        fa = self.extract(img_a)
        fb = self.extract(img_b)
        lin = self.lin
        if lin is None:
            # uniform lin weights are NOT LPIPS (the metric is defined by the
            # richzhang-trained per-channel weights,
            # /root/reference/lpipsPyTorch/modules/networks.py:12-96); never
            # return a plausible-looking but wrong number silently
            if not self.allow_uniform_lin:
                raise RuntimeError(
                    "no lin weights loaded (pass weights_dir with the richzhang "
                    ".pth or an npz); uniform weights are not LPIPS — opt in "
                    "explicitly with allow_uniform_lin=True if you want the "
                    "unweighted feature distance")
            import warnings
            warnings.warn("LPIPS running with UNIFORM lin weights — this is the "
                          "unweighted feature distance, not LPIPS", stacklevel=2)
            lin = [jnp.ones(f.shape[0]) / f.shape[0] for f in fa]
        return float(lpips_distance(fa, fb, lin))
