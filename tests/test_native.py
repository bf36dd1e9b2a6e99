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


def test_img_ids_ride_along_aligned():
    """img_ids ride the pool as a 10th float column and stay row-aligned
    through the C++ shuffle: encode each row's id into its target pixel
    and check every served (target, img_idx) pair agrees."""
    n = 512
    pool = _pool(n, seed=2)
    ids = np.arange(n, dtype=np.int64) % 37
    pool[:, 2, 0] = ids.astype(np.float32)  # target.r encodes the id
    b = NativeRayBatcher(pool, n_rand=64, seed=3, img_ids=ids)
    for _ in range(12):  # crosses an epoch reshuffle (512/64 = 8)
        batch = b.next()
        assert batch["img_idx"].dtype == np.int32
        np.testing.assert_array_equal(
            batch["img_idx"].astype(np.float32), batch["target"][:, 0])
    b.close()
    # Without ids, the key is absent (numpy-sampler parity).
    b2 = NativeRayBatcher(pool, n_rand=64, seed=3)
    assert "img_idx" not in b2.next()
    b2.close()
