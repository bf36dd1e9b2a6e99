"""Tests for the native C++ ray batcher."""

import numpy as np
import pytest

from indoor_nerf_tpu.native.batcher import NativeRayBatcher, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def _pool(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 3, 3)).astype(np.float32)


def test_batches_cover_pool_each_epoch():
    pool = _pool(1024)
    b = NativeRayBatcher(pool, n_rand=128, seed=0)
    seen = set()
    for _ in range(8):  # exactly one epoch
        batch = b.next()
        for row in batch["rays_o"]:
            seen.add(tuple(np.round(row, 5)))
    # all 1024 distinct rays served exactly once per epoch
    assert len(seen) == 1024
    b.close()


def test_rows_are_pool_rows():
    pool = _pool(256)
    b = NativeRayBatcher(pool, n_rand=64, seed=1)
    batch = b.next()
    flat_pool = pool.reshape(256, 9)
    got = np.concatenate(
        [batch["rays_o"], batch["rays_d"], batch["target"]], axis=1
    )
    # every served row must be an exact pool row
    pool_set = {tuple(r) for r in flat_pool}
    for r in got:
        assert tuple(r) in pool_set
    b.close()


def test_epoch_reshuffle_changes_order():
    pool = _pool(128)
    b = NativeRayBatcher(pool, n_rand=128, seed=2)
    first = b.next()["rays_o"].copy()
    second = b.next()["rays_o"].copy()  # next epoch, reshuffled
    assert b.epoch >= 2
    assert not np.array_equal(first, second)
    # same multiset of rows
    assert sorted(map(tuple, np.round(first, 5))) == sorted(
        map(tuple, np.round(second, 5))
    )
    b.close()


def test_throughput_sane():
    import time

    pool = _pool(100_000)
    b = NativeRayBatcher(pool, n_rand=1024, seed=3)
    b.next()  # warm the ring
    t0 = time.perf_counter()
    for _ in range(200):
        b.next()
    dt = time.perf_counter() - t0
    # far faster than a training step; just ensure it's not pathological
    assert dt / 200 < 5e-3, dt / 200
    b.close()
