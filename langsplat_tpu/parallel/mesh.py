"""Device mesh utilities for multi-chip training.

The reference has no distributed layer at all (SURVEY.md §2.3: single process, cuda:0
pinned at `/root/reference/utils/general_utils.py:133`); this is new TPU-native design:
a 1-D `('data',)` mesh shards training views (the workload's natural outer loop — each
step renders whole views), with parameters replicated and gradients psum'd over ICI.
A second `('data','gauss')` factorization shards the Gaussian axis for preprocess-heavy
stages. Multi-host entry goes through `jax.distributed.initialize` + the same mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_names: tuple = ("data",)) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(axis_names) == 1:
        return Mesh(np.asarray(devices), axis_names)
    # 2-D factorization: put as many devices as possible on the trailing axis
    n = len(devices)
    d0 = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            d0 = cand
            break
    return Mesh(np.asarray(devices).reshape(d0, n // d0), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
