#!/usr/bin/env python
"""Result-equivalence harness for optimization rounds: run every declared
query at the given scale factors, canonicalize rows (sorted, repr-rounded)
and emit a sha256 per (query, sf). Comparing the JSON from before and after
a plan rewrite proves the rewrite computes THE SAME RESULT on the driver's
actual data — the oracle-hash invariant the round must preserve.

Usage:
    python bench/result_checksums.py --sfs sf0.001,sf0.01,sf0.1 \
        [--queries a,b,c] --out before.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def canon_cell(v):
    if isinstance(v, float):
        # repr of float64 is exact round-trip; results are pre-rounded by
        # the queries themselves, so this is stable
        return repr(v)
    return repr(v)


def checksum(rows) -> str:
    lines = sorted("|".join(canon_cell(c) for c in r) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="sf0.001,sf0.01,sf0.1")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from simplecrawler_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app="result-checksums", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else list(qs)
    out: dict = {}
    for sf in args.sfs.split(","):
        sf_dir = f"/root/testdata/{sf}"
        for name in names:
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"checksum {name}@{sf}")
            rows = [tuple(r) for r in qs[name](spark, sf_dir).collect()]
            from simplecrawler_spark.pipeline import release_cached
            release_cached()
            spark.catalog.clearCache()
            out[f"{name}@{sf}"] = {
                "n_rows": len(rows), "sha256": checksum(rows),
                "seconds": round(time.time() - t0, 2)}
            print(f"{name}@{sf}: {len(rows)} rows "
                  f"{out[f'{name}@{sf}']['sha256'][:16]} "
                  f"({out[f'{name}@{sf}']['seconds']}s)", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
