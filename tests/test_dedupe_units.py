import os

import numpy as np

from simplecrawler_spark.operators import dedupe as dd


def _hashes(n, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_bloom_no_false_negatives_and_low_fpr():
    h = _hashes(20_000, 1)
    other = _hashes(20_000, 2)
    bits = np.zeros((20_000 * 10 + 7) // 8, dtype=np.uint8)
    dd.bloom_add(bits, h, k=7)
    assert dd.bloom_check(bits, h, k=7).all()  # no false negatives, ever
    fpr = dd.bloom_check(bits, other, k=7).mean()
    assert fpr < 0.02


def test_cuckoo_no_false_negatives_and_tiny_fpr():
    h = _hashes(50_000, 3)
    other = _hashes(50_000, 4)
    nb = 1
    while nb * 4 * 0.95 < len(h):
        nb *= 2
    table = np.zeros((nb, 4), dtype=np.uint16)
    assert dd.cuckoo_add(table, h)
    assert dd.cuckoo_check(table, h).all()
    fpr = dd.cuckoo_check(table, other).mean()
    assert fpr < 0.005


def test_cuckoo_insert_idempotent_for_duplicates():
    h = _hashes(100, 5)
    nb = 256
    table = np.zeros((nb, 4), dtype=np.uint16)
    assert dd.cuckoo_add(table, h)
    assert dd.cuckoo_check(table, h).all()


def test_cuckoo_reinsert_does_not_inflate_occupancy():
    """Task-retry model: the same batch inserted twice must not grow the
    table (else occupancy creeps and a spurious overflow can fire)."""
    h = _hashes(500, 11)
    nb = 256
    table = np.zeros((nb, 4), dtype=np.uint16)
    assert dd.cuckoo_add(table, h)
    occ1 = int((table != 0).sum())
    assert dd.cuckoo_add(table, h)  # re-run of the identical batch
    occ2 = int((table != 0).sum())
    assert occ2 == occ1
    assert dd.cuckoo_check(table, h).all()


def test_cuckoo_near_capacity_survives_retries():
    """A table sized for ~95% occupancy must accept its keyset repeatedly
    (the retry scenario that used to overflow)."""
    nb = 64  # 256 slots
    keys = _hashes(230, 13)  # ~90% full
    table = np.zeros((nb, 4), dtype=np.uint16)
    for _ in range(5):
        assert dd.cuckoo_add(table, keys)
    assert dd.cuckoo_check(table, keys).all()


def test_sidecar_params_sane():
    bloom_bytes, k, nb = dd.sidecar_params(2_000_000, 32, 10)
    assert bloom_bytes * 8 >= (2_000_000 // 32) * 10
    assert 1 <= k <= 10
    assert nb * 4 * 0.95 >= 2_000_000 // 32


def test_sidecar_save_load_roundtrip(tmp_path):
    root = str(tmp_path)
    bits = np.arange(64, dtype=np.uint8)
    table = np.arange(32, dtype=np.uint16).reshape(8, 4)
    dd.save_sidecars(root, 3, bits, table)
    b2, t2 = dd.load_sidecars(root, 3, 64, 8)
    assert np.array_equal(bits, b2) and np.array_equal(table, t2)


def test_rebuild_sidecars_streaming_and_capacity_retry(spark, tmp_path):
    """rebuild_sidecars streams (bucket, url_hash) batches and, when the
    configured seen_capacity undersizes the cuckoo table, retries at doubled
    capacity instead of raising; the final sidecars hold every key."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "wh")
    os.makedirs(root, exist_ok=True)
    n = 3000  # > 2048 slots of the capacity-1024 table (nb=512 × 4)
    seen = spark.range(n).select(
        F.lit(0).cast("int").alias("bucket"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    dd.rebuild_sidecars(spark, root, seen, n_buckets=1,
                        seen_capacity=1024, bits_per_key=12)
    import numpy as np

    bits = np.load(os.path.join(root, "sidecars", "bucket=0", "bloom.npy"))
    table = np.load(os.path.join(root, "sidecars", "bucket=0", "cuckoo.npy"))
    assert table.shape[0] > 512, "capacity retry did not grow the table"
    h = np.array([r["url_hash"] for r in seen.collect()], dtype=np.int64)
    _, k, _ = dd.sidecar_params(1024, 1, 12)
    assert dd.bloom_check(bits, h, k).all()
    assert dd.cuckoo_check(table, h).all()
