"""Self-check mirroring the driver's CORRECTNESS gate: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, compare row count, column names, and sorted
values (floats to 9 significant digits — stricter than a value-hash needs)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def _rows(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


@pytest.fixture(scope="module")
def duck():
    return _duck(SF_DIR)


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    ores = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in ores.description]
    duck_rows = ores.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    # driver sorts columns by name before hashing — do the same
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = _rows([[r[i] for i in sidx] for r in spark_rows])
    d = _rows([[r[i] for i in didx] for r in duck_rows])
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    for name, q in entry_mod.queries().items():
        if name in ORACLED:
            continue
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name


# Recorded value-hashes for the seeded-numpy hash-family variants (Gaussian
# hyperplanes / xxhash rolling shingles — no SQL twin; since r4 the
# queries() entries of the same names use md5-derived families and ARE
# DuckDB-oracled, so these pins now exercise the numpy variants directly).
# They are fully deterministic functions of the fixed testdata + seed, so
# any silent change to the hyperplane generation, banding, or verify math
# breaks these pins even without a DuckDB oracle.
def _ann_lsh_gaussian(spark, sf_dir):
    from pyspark.sql import functions as F

    from simplecrawler_spark.pipeline.similarity import ann_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ann_topk_lsh(emb.where(F.col("vec_id") != 0), [float(x) for x in qvec],
                        k=10, n_bits=8, probe_hamming=1)


def _simhash_xxhash(spark, sf_dir):
    from simplecrawler_spark.pipeline.dedup import simhash_fingerprints, simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(simhash_fingerprints(docs), max_hamming=3)


_PINNED_FNS = {"ann_lsh_topk": _ann_lsh_gaussian, "simhash_near_dup": _simhash_xxhash}
_PINNED = {
    ("/root/testdata/sf0.001", "ann_lsh_topk"): (10, "d45f4fffab8f1ffc01367afc2daea209"),
    ("/root/testdata/sf0.001", "simhash_near_dup"): (495, "b813a59ce761e57f7e08f3e3821739dc"),
    ("/root/testdata/sf0.01", "ann_lsh_topk"): (10, "7bdf9386875004804064081a25097032"),
    ("/root/testdata/sf0.01", "simhash_near_dup"): (626, "5203ea9581216fc1e008d7ca54d07d6d"),
}


@pytest.mark.parametrize("sf_dir,name", sorted(_PINNED))
def test_rows_only_value_hash_pinned(spark, sf_dir, name):
    import hashlib

    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    df = _PINNED_FNS[name](spark, sf_dir)
    cols = sorted(df.columns)
    idx = [df.columns.index(c) for c in cols]
    rows = sorted(tuple(_norm(r[i]) for i in idx) for r in df.collect())
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    want_n, want_h = _PINNED[(sf_dir, name)]
    assert (len(rows), h) == (want_n, want_h), f"{name}@{sf_dir}: rows={len(rows)} hash={h}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
