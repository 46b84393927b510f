"""Training-data pipeline operators over crawled corpora.

A crawler that feeds a 100 TB training pipeline needs more than fetch+dedupe
of URLs — it needs *content* dedupe (exact, MinHash-LSH, SimHash), embedding
similarity search, text quality analysis, and multimodal payload plumbing.
These are first-class engine components: built-in-function-first (JVM/
whole-stage-codegen), Arrow-batched pandas UDFs only where Spark lacks the
primitive, and every shuffle keyed for scale (banded LSH join, segment-
blocked Hamming join — never an O(n²) cross join).

Cache lifecycle: pair-generator pipelines persist() heavy shared subtrees
(the gram explode, signature scans) because Spark has no cross-branch subtree
dedup — but the returned DataFrames are lazy, so the library cannot know when
the caller's terminal action has run. The contract: persists are REGISTERED
here, and callers composing multiple pipeline invocations in one long-lived
session call :func:`release_cached` between them (bench.py does). A single
query-then-discard caller can ignore this — executor storage eviction is the
backstop.
"""

from __future__ import annotations

_PERSISTED: list = []


def _persist(df, level: str = "MEMORY_AND_DISK"):
    """persist() + register for later release_cached()."""
    from pyspark import StorageLevel

    out = df.persist(getattr(StorageLevel, level))
    _PERSISTED.append(out)
    return out


def release_cached() -> int:
    """Unpersist every DataFrame a pipeline function cached since the last
    call. Returns the number released. Safe to call at any time — releasing
    a cache never changes results, only recompute cost."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
