"""Content deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard. Designed for the 100 TB regime: every candidate-pair generator is a
*blocked equi-join* (band hash / Hamming segment), never a cross join; the
heavy per-doc math (shingling, signatures) is one Arrow-batched pandas UDF
pass with pure numpy inside.

Shapes:
  * exact        — hash-groupBy, map-side combinable, one shuffle.
  * MinHash LSH  — shingle→64-bit hash→k permutations (a·h+b mod p, numpy
                   broadcast)→b bands; pairs from groupBy(band, band_hash);
                   optional exact-Jaccard verify on candidates only.
  * SimHash      — 64-bit sign-of-weighted-sum fingerprint; near-dup pairs
                   via 4-segment pigeonhole blocking (Hamming ≤ 3 ⇒ one
                   16-bit segment equal).
  * n-gram Jaccard — exact verify kernel (shared by the LSH verify step).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

_MERSENNE = np.uint64((1 << 61) - 1)
_LOG = logging.getLogger(__name__)


def drop_hot_buckets(df: DataFrame, keys: list[str], cap: int, what: str) -> DataFrame:
    """Cap LSH bucket sizes — the thing that actually kills LSH jobs on real
    web corpora: one degenerate key (empty/boilerplate docs) turns a blocked
    equi-join quadratic (O(|bucket|²) pairs) or OOMs a single collect_set row.

    Keys with more than ``cap`` members are dropped from pair generation
    entirely (they are boilerplate, not near-duplicate signal) and the
    dropped mass is LOGGED — never a silent truncation. The count aggregation
    is map-side combinable (cheap); the hot-key set is tiny by construction
    (≤ |df|/cap keys) so the removal is a broadcast anti-join."""
    if cap is None or cap <= 0:
        return df
    hot = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") > cap))
    stats = hot.agg(F.count(F.lit(1)).alias("k"),
                    F.sum("_n").alias("rows")).collect()[0]
    if stats["k"]:
        _LOG.warning(
            "%s: dropped %d hot bucket(s) above cap=%d (%d member rows) — "
            "degenerate/boilerplate-heavy keys excluded from pair generation",
            what, stats["k"], cap, stats["rows"])
        return df.join(F.broadcast(hot.select(*keys)), list(keys), "left_anti")
    return df


def exact_dupes(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedupe: md5(text) groups; keeper = min id (deterministic)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingle_hashes(s: str, n: int) -> np.ndarray:
    """Character n-gram set → 64-bit hashes (vectorized sliding window over
    the byte array; polynomial hash per window via matrix dot)."""
    b = np.frombuffer(s.lower().encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, n).astype(np.uint64)
    R = np.uint64(1099511628211)
    pw = np.full(n, R, dtype=np.uint64)
    pw[0] = 1
    with np.errstate(over="ignore"):
        pw = np.cumprod(pw)[::-1]
        h = (win * pw).sum(axis=1)
    return np.unique(h)


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle: int = 5, seed: int = 42) -> DataFrame:
    """doc → array<long> MinHash signature. One mapInPandas pass; the k
    permutations apply as one (k × |shingles|) numpy broadcast per doc."""
    rng = np.random.Generator(np.random.PCG64(seed))
    A = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    B = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def sig(batches):
        for pdf in batches:
            out = np.zeros((len(pdf), num_perm), dtype=np.int64)
            texts = pdf[text_col].to_numpy()
            with np.errstate(over="ignore"):
                for i, s in enumerate(texts):
                    if s is None:
                        continue
                    h = _shingle_hashes(s, shingle)
                    vals = (A[:, None] * h[None, :] + B[:, None]) % _MERSENNE
                    out[i] = vals.min(axis=1).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf[id_col], "signature": list(out)})

    return docs.select(id_col, text_col).mapInPandas(
        sig, schema=f"doc_id long, signature array<long>")


def minhash_pairs(signatures: DataFrame, bands: int = 16,
                  max_bucket: int = 4096) -> DataFrame:
    """LSH banding: equal band-hash ⇒ candidate pair. The only shuffle is
    groupBy(band, band_hash) — linear in corpus size. Buckets larger than
    ``max_bucket`` are dropped (logged) before the collect_set — see
    :func:`drop_hot_buckets`."""
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("signature"),
                        b * (F.size("signature") / bands).cast("int") + 1,
                        (F.size("signature") / bands).cast("int"),
                    ).cast("string")
                ),
            )
        ).alias("band", "band_hash"),
    )
    banded = drop_hot_buckets(banded, ["band", "band_hash"], max_bucket,
                              "minhash_pairs")
    grouped = banded.groupBy("band", "band_hash").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ids")
    ).where(F.size("ids") > 1)
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.size("ids") - 2),
                    lambda i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda j: F.struct(F.col("ids")[i].alias("a"), j.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b").distinct()
    return pairs


def jaccard_verify(pairs: DataFrame, docs: DataFrame, threshold: float = 0.7,
                   text_col: str = "text", id_col: str = "doc_id",
                   shingle: int = 5) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (post-LSH verify)."""
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    joined = (
        pairs.join(d.withColumnRenamed("_id", "a").withColumnRenamed("_t", "ta"), "a")
        .join(d.withColumnRenamed("_id", "b").withColumnRenamed("_t", "tb"), "b")
    )

    def verify(batches):
        for pdf in batches:
            sims = np.zeros(len(pdf))
            for i in range(len(pdf)):
                ha = _shingle_hashes(pdf["ta"].iat[i] or "", shingle)
                hb = _shingle_hashes(pdf["tb"].iat[i] or "", shingle)
                inter = len(np.intersect1d(ha, hb, assume_unique=True))
                union = len(ha) + len(hb) - inter
                sims[i] = inter / union if union else 0.0
            yield pd.DataFrame({"a": pdf["a"], "b": pdf["b"], "jaccard": sims})

    out = joined.mapInPandas(verify, schema="a long, b long, jaccard double")
    return out.where(F.col("jaccard") >= threshold)


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                         shingle: int = 4) -> DataFrame:
    """64-bit SimHash: sign of per-bit weighted sums of shingle hashes."""

    def fp(batches):
        bitpos = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, s in enumerate(pdf[text_col].to_numpy()):
                if not s:
                    continue
                h = _shingle_hashes(s, shingle)
                bits = ((h[:, None] >> bitpos[None, :]) & np.uint64(1)).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                out[i] = np.uint64(((v > 0).astype(np.uint64) << bitpos).sum()).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf[id_col], "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(fp, schema="doc_id long, simhash long")


def simhash_pairs(fps: DataFrame, max_hamming: int = 3,
                  max_bucket: int = 4096) -> DataFrame:
    """Pigeonhole blocking: split 64 bits into 4 segments — Hamming ≤ 3 ⇒ at
    least one 16-bit segment identical ⇒ equi-join per segment, then exact
    Hamming filter via bit_count(xor). No cross join. Segment values shared
    by more than ``max_bucket`` docs self-join quadratically — dropped
    (logged); a true near-dup pair inside a dropped segment still has three
    other pigeonhole segments to collide on."""
    seg = fps.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", s * 16).bitwiseAND(F.lit(0xFFFF))
            for s in range(4)
        ])).alias("seg_id", "seg_val"),
    )
    seg = drop_hot_buckets(seg, ["seg_id", "seg_val"], max_bucket, "simhash_pairs")
    a = seg.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "seg_id", "seg_val")
    b = seg.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "seg_id", "seg_val")
    cand = a.join(b, ["seg_id", "seg_val"]).where(F.col("a") < F.col("b"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.select("a", "b", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming).distinct())
