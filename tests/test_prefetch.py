"""Async feature prefetcher + device LRU: hits, eviction, scheduled vs sync loads."""

import threading
import time

import numpy as np
import jax.numpy as jnp

from langsplat_tpu.data.prefetch import DeviceLRU, FeaturePrefetcher


class FakeCam:
    calls = 0

    def __init__(self, name, delay=0.0):
        self.image_name = name
        self.delay = delay

    def get_language_feature(self, lf_path, level):
        FakeCam.calls += 1
        if self.delay:
            time.sleep(self.delay)
        h = w = 4
        seed = hash(self.image_name) % 97
        feat = np.full((3, h, w), seed, np.float32)
        mask = np.ones((1, h, w), np.float32)
        return feat, mask


def test_lru_eviction_by_bytes():
    lru = DeviceLRU(max_bytes=3 * 8 * 4)  # room for 3 8-float arrays
    for i in range(5):
        lru.put(i, jnp.arange(8, dtype=jnp.float32))
    assert len(lru) == 3
    assert lru.get(0) is None and lru.get(1) is None
    assert lru.get(4) is not None
    # get() refreshes recency: 2 survives the next insert, 3 does not
    lru.get(2)
    lru.put(9, jnp.arange(8, dtype=jnp.float32))
    assert lru.get(2) is not None and lru.get(3) is None


def test_prefetcher_schedule_then_get():
    FakeCam.calls = 0
    pf = FeaturePrefetcher("/nonexistent", 1, max_cache_bytes=1 << 20)
    cam = FakeCam("a", delay=0.05)
    pf.schedule(cam)
    feat, mask = pf.get(cam)
    assert float(feat[0, 0, 0]) == hash("a") % 97
    assert feat.shape == (3, 4, 4) and mask.shape == (1, 4, 4)
    # second get is a cache hit: no new disk load
    pf.get(cam)
    assert FakeCam.calls == 1
    # duplicate schedule while cached is a no-op
    pf.schedule(cam)
    assert FakeCam.calls == 1
    pf.close()


def test_prefetcher_sync_fallback_and_distinct_views():
    FakeCam.calls = 0
    pf = FeaturePrefetcher("/nonexistent", 2, max_cache_bytes=1 << 20)
    a, b = FakeCam("a"), FakeCam("b")
    fa, _ = pf.get(a)   # never scheduled: synchronous load
    fb, _ = pf.get(b)
    assert FakeCam.calls == 2
    assert float(fa[0, 0, 0]) == hash("a") % 97
    assert float(fb[0, 0, 0]) == hash("b") % 97
    pf.close()


def test_prefetcher_concurrent_schedules_single_load():
    FakeCam.calls = 0
    pf = FeaturePrefetcher("/nonexistent", 1, max_cache_bytes=1 << 20)
    cam = FakeCam("slow", delay=0.1)
    threads = [threading.Thread(target=pf.schedule, args=(cam,)) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    pf.get(cam)
    assert FakeCam.calls == 1
    pf.close()
