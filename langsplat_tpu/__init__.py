"""langsplat_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
LangSplat (reference: valebi/LangSplat): differentiable 3D Gaussian splatting that renders
RGB plus a 3-dimensional language-feature channel, trained against SAM-segmented CLIP
embeddings compressed by a scene-wise autoencoder, evaluated by open-vocabulary IoU and
localization.

Design stance (not a port): functional core (`params pytree -> loss`) under jit/pjit; the
rasterizer is tile-binned via stable multi-key `lax.sort` and blended by a Pallas TPU kernel
whose inner loop is chunked — per-chunk alpha evaluation on the VPU, transmittance as a
cumulative product, and the weighted color/feature accumulation as an MXU matmul — with a
custom VJP built from segment-sums instead of atomics (bitwise-deterministic gradients).
Densification runs under static padded capacity with an alive mask. Distribution uses a
`jax.sharding.Mesh` with XLA collectives over ICI.
"""

__version__ = "0.1.0"

__all__ = ["GaussianField", "render", "__version__"]


def __getattr__(name):  # lazy top-level exports; keeps `import langsplat_tpu` cheap
    if name == "GaussianField":
        from langsplat_tpu.models.gaussian_field import GaussianField
        return GaussianField
    if name == "render":
        from langsplat_tpu.ops.render import render
        return render
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
