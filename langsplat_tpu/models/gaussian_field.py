"""GaussianField: the scene's Gaussian parameters as a static-capacity pytree.

TPU-native counterpart of `GaussianModel` (`/root/reference/scene/gaussian_model.py:24`),
re-designed around XLA static shapes (SURVEY.md §7 hard part 1): parameters live in fixed
`capacity`-sized arrays with an `alive` mask; densify/clone/split/prune are masked scatters
(see train/densify.py) instead of tensor reallocation + optimizer-state surgery.

Parameter conventions preserved for checkpoint/PLY interop:
  - xyz [cap,3]; features_dc [cap,1,3]; features_rest [cap,(K-1),3] (K=(deg+1)^2);
    scaling [cap,3] stored in log space; rotation [cap,4] unnormalized (w,x,y,z);
    opacity [cap,1] stored as logits; language_feature [cap,F] or None;
  - activations exp/normalize/sigmoid as at `scene/gaussian_model.py:26-41`;
  - creation: RGB2SH DC init, mean-3NN-distance log scales, identity quats, opacity 0.1
    (`scene/gaussian_model.py:170-196`).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.core import sh as sh_lib
from langsplat_tpu.core import transforms
from langsplat_tpu.ops.knn import mean_knn_sq_dist


@jax.tree_util.register_dataclass
@dataclass
class GaussianField:
    xyz: jnp.ndarray            # [cap, 3]
    features_dc: jnp.ndarray    # [cap, 1, 3]
    features_rest: jnp.ndarray  # [cap, K-1, 3]
    scaling: jnp.ndarray        # [cap, 3] log-scales
    rotation: jnp.ndarray       # [cap, 4] quaternions (w,x,y,z), unnormalized
    opacity: jnp.ndarray        # [cap, 1] logits
    language_feature: jnp.ndarray | None  # [cap, F] or None (RGB phase)
    alive: jnp.ndarray          # [cap] bool

    # -- activated views (reference `get_*` properties) --
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)

    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / (jnp.linalg.norm(self.rotation, axis=-1,
                                                keepdims=True) + 1e-12)

    @property
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jnp.ndarray:  # [cap, K, 3]
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    @property
    def get_language_feature(self) -> jnp.ndarray:
        if self.language_feature is None:
            raise ValueError("language feature not initialized (RGB phase field)")
        return self.language_feature

    def get_covariance(self, scale_modifier: float = 1.0) -> jnp.ndarray:
        """[cap, 6] packed symmetric covariance (reference get_covariance)."""
        cov = transforms.build_covariance_3d(self.get_scaling, self.rotation,
                                             scale_modifier)
        return transforms.strip_symmetric(cov)

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.features_rest.shape[1]
        return int(round(np.sqrt(k))) - 1

    def with_language_feature(self, num_feat: int = 3, init_scale: float = 1e-2,
                              seed: int = 0) -> "GaussianField":
        """Attach a language feature table (phase handoff,
        `/root/reference/scene/gaussian_model.py:203-207`).

        Deliberate departure from the reference's zero init: features are rendered
        L2-normalized, and the normalization Jacobian at exactly zero is ~1/eps (=5e8) —
        one such gradient poisons Adam's second moment and stalls the phase for thousands
        of steps (latent in the torch code too). A small random init bounds the Jacobian
        by 1/init_scale while leaving the rendered features near zero.
        """
        if self.language_feature is not None:
            return self
        lf = init_scale * jax.random.normal(jax.random.key(seed),
                                            (self.capacity, num_feat), self.xyz.dtype)
        return replace(self, language_feature=lf)


def create_from_pcd(points: np.ndarray, colors: np.ndarray, *, sh_degree: int,
                    capacity: int | None = None,
                    num_feat: int | None = None) -> GaussianField:
    """Initialize from an SfM point cloud (reference create_from_pcd semantics)."""
    n = points.shape[0]
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < point count {n}")
    k = (sh_degree + 1) ** 2

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_knn_sq_dist(pts), 1e-7)
    log_scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def padded(x, fill=0.0):
        full = jnp.full((cap,) + x.shape[1:], fill, jnp.float32)
        return full.at[:n].set(x)

    dc = sh_lib.rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]
    rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opa = transforms.inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))

    return GaussianField(
        xyz=padded(pts),
        features_dc=padded(dc),
        features_rest=jnp.zeros((cap, k - 1, 3), jnp.float32),
        scaling=padded(log_scales, fill=-10.0),
        rotation=padded(rot).at[n:, 0].set(1.0),
        opacity=padded(opa, fill=-10.0),
        language_feature=None,
        alive=jnp.zeros((cap,), bool).at[:n].set(True),
    )


def grow_capacity(field: GaussianField, new_capacity: int) -> GaussianField:
    """Pad all arrays to a larger capacity (host-side; triggers recompilation)."""
    cap = field.capacity
    if new_capacity <= cap:
        return field
    extra = new_capacity - cap

    def pad(x, fill=0.0):
        if x is None:
            return None
        pad_block = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad_block], axis=0)

    return GaussianField(
        xyz=pad(field.xyz),
        features_dc=pad(field.features_dc),
        features_rest=pad(field.features_rest),
        scaling=pad(field.scaling, -10.0),
        rotation=pad(field.rotation).at[cap:, 0].set(1.0),
        opacity=pad(field.opacity, -10.0),
        language_feature=pad(field.language_feature),
        alive=pad(field.alive, False),
    )


def compact(field: GaussianField) -> GaussianField:
    """Host-side: move alive Gaussians to the front (stable order). Useful before save."""
    order = jnp.argsort(~field.alive, stable=True)

    def take(x):
        return None if x is None else x[order]

    return jax.tree.map(take, field, is_leaf=lambda x: x is None)
