"""Async host-side data pipeline: device LRU cache + language-feature prefetcher.

The reference reloads `<image>_s.npy` / `<image>_f.npy` from disk and re-uploads the
gathered [3,H,W] map on EVERY training iteration (`scene/cameras.py:58-92` called from
`train.py:96`, flagged as the second-hottest loop cost in SURVEY.md §3.1). Here the
training loop pops cameras from a pre-shuffled stack, so the next view is known one
step ahead: a small worker pool decodes the numpy contract and stages the arrays onto
the device while the current step computes, and a byte-bounded LRU keeps recently used
views resident in HBM (a full LERF-scale scene of decoded feature maps does not fit, so
unbounded caching is not an option).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor


def _nbytes(tree) -> int:
    total = 0
    for leaf in tree if isinstance(tree, (tuple, list)) else (tree,):
        total += getattr(leaf, "nbytes", 0)
    return total


class DeviceLRU:
    """Byte-bounded LRU of device arrays (thread-safe)."""

    def __init__(self, max_bytes: int = 2 << 30):
        self.max_bytes = max_bytes
        self._lock = threading.Lock()
        self._items: OrderedDict = OrderedDict()
        self._bytes = 0

    def get(self, key):
        with self._lock:
            if key not in self._items:
                return None
            self._items.move_to_end(key)
            return self._items[key]

    def put(self, key, value) -> None:
        size = _nbytes(value)
        with self._lock:
            if key in self._items:
                self._items.move_to_end(key)
                return
            if size > self.max_bytes:
                return  # too big to ever cache
            while self._bytes + size > self.max_bytes and self._items:
                _, old = self._items.popitem(last=False)
                self._bytes -= _nbytes(old)
            self._items[key] = value
            self._bytes += size

    def __len__(self) -> int:
        return len(self._items)


class FeaturePrefetcher:
    """Overlaps feature-map decode + host->device transfer with the train step.

    `schedule(cam)` kicks off a background load for a camera that will be consumed
    soon; `get(cam)` returns (feature, mask) as device arrays — from the LRU, from a
    pending future, or synchronously as a fallback. Keys are camera image names
    (unique per scene split).
    """

    def __init__(self, lf_path: str, feature_level: int, *,
                 max_cache_bytes: int = 2 << 30, workers: int = 2):
        self.lf_path = lf_path
        self.feature_level = feature_level
        self.cache = DeviceLRU(max_cache_bytes)
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._lock = threading.Lock()
        self._pending: dict = {}

    def _load(self, cam):
        import jax.numpy as jnp
        feat, mask = cam.get_language_feature(self.lf_path, self.feature_level)
        value = (jnp.asarray(feat), jnp.asarray(mask))
        self.cache.put(cam.image_name, value)
        return value

    def schedule(self, cam) -> None:
        key = cam.image_name
        if self.cache.get(key) is not None:
            return
        with self._lock:
            if key in self._pending:
                return
            fut = self._pool.submit(self._load, cam)
            self._pending[key] = fut

            def _done(_fut, key=key):
                with self._lock:
                    self._pending.pop(key, None)

            fut.add_done_callback(_done)

    def get(self, cam):
        key = cam.image_name
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        with self._lock:
            fut: Future | None = self._pending.get(key)
        if fut is not None:
            return fut.result()
        return self._load(cam)

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)
