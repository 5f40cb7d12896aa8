"""Scene-wise language autoencoder: 512-d CLIP features <-> 3-d latent codes.

TPU-native (flax) counterpart of `/root/reference/autoencoder/model.py:5-46`, with the
same layer structure quirks preserved:
  - encoder: Linear(512,256) then per stage [BatchNorm(prev), ReLU, Linear] down to 3;
    BatchNorm precedes ReLU and normalizes the PREVIOUS layer's output;
  - decoder: Linear(3,16) then [ReLU, Linear] stages up to 512, no BatchNorm;
  - both encode() and decode() L2-normalize their outputs;
  - training loss: L2 + 0.001 * cosine, where the cosine similarity runs over the BATCH
    axis (dim=0) per the reference's `cos_loss` (`autoencoder/train.py:16-17`) — an odd
    but preserved detail.

The whole model is a few tiny matmuls — it jits into one fused TPU program and can
co-train inside the main training process (BASELINE.json config 3).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

DEFAULT_ENCODER_DIMS = (256, 128, 64, 32, 3)
DEFAULT_DECODER_DIMS = (16, 32, 64, 128, 256, 256, 512)


class Autoencoder(nn.Module):
    encoder_dims: Sequence[int] = DEFAULT_ENCODER_DIMS
    decoder_dims: Sequence[int] = DEFAULT_DECODER_DIMS
    input_dim: int = 512

    def setup(self):
        # HIGHEST: TPU Dense matmuls default to bf16 inputs; the reference AE
        # trains/encodes in torch f32 and the 3-d codes feed cosine-threshold
        # eval logic, so keep the MLP f32-exact (the model is tiny)
        prec = jax.lax.Precision.HIGHEST
        self.enc_dense = [nn.Dense(d, name=f"enc_dense_{i}", precision=prec)
                          for i, d in enumerate(self.encoder_dims)]
        self.enc_bn = [nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=f"enc_bn_{i}")
                       for i in range(1, len(self.encoder_dims))]
        self.dec_dense = [nn.Dense(d, name=f"dec_dense_{i}", precision=prec)
                          for i, d in enumerate(self.decoder_dims)]

    def encode(self, x, train: bool = False):
        for i, dense in enumerate(self.enc_dense):
            if i > 0:
                x = self.enc_bn[i - 1](x, use_running_average=not train)
                x = nn.relu(x)
            x = dense(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    def decode(self, x, train: bool = False):
        del train
        for i, dense in enumerate(self.dec_dense):
            if i > 0:
                x = nn.relu(x)
            x = dense(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x, train=train), train=train)


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def cos_loss(pred, target):
    """1 - mean cosine similarity over the BATCH axis (reference dim=0 quirk)."""
    num = jnp.sum(pred * target, axis=0)
    den = (jnp.linalg.norm(pred, axis=0) * jnp.linalg.norm(target, axis=0) + 1e-12)
    return 1.0 - jnp.mean(num / den)


def ae_loss(pred, target, cos_weight: float = 0.001):
    return l2_loss(pred, target) + cos_weight * cos_loss(pred, target)


def init_autoencoder(rng, encoder_dims=DEFAULT_ENCODER_DIMS,
                     decoder_dims=DEFAULT_DECODER_DIMS, input_dim: int = 512):
    """-> (model, variables) with params + batch_stats collections."""
    model = Autoencoder(encoder_dims=tuple(encoder_dims),
                        decoder_dims=tuple(decoder_dims), input_dim=input_dim)
    variables = model.init(rng, jnp.zeros((2, input_dim)), train=True)
    return model, variables
