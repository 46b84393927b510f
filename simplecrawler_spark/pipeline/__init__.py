"""Training-data pipeline operators over crawled corpora.

A crawler that feeds a 100 TB training pipeline needs more than fetch+dedupe
of URLs — it needs *content* dedupe (exact, MinHash-LSH, SimHash), embedding
similarity search, text quality analysis, and multimodal payload plumbing.
These are first-class engine components: built-in-function-first (JVM/
whole-stage-codegen), Arrow-batched pandas UDFs only where Spark lacks the
primitive, and every shuffle keyed for scale (banded LSH join, segment-
blocked Hamming join — never an O(n²) cross join).
"""
