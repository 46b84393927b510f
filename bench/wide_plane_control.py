#!/usr/bin/env python
"""Wide-row Spark data-plane control: the SAME pure-JVM shuffle+agg shape as
``spark_plane_control.py`` but with rows shaped like the crawl's candidate
stream (~150 B: two ~60 B URL-like strings + three numeric cols) instead of
16 B (id, k).

Why it exists (round 4): in one quiet session the narrow-row control scaled
0.939 at 2v8 pinned cores while the engine's stable 2v8 cell measured 0.549
— an apparent 0.58-of-ceiling shortfall. But the engine shuffles ~150 B
string rows, not 16 B longs; a memory-bandwidth knee that narrow rows fit
under can still cap wide rows. This control isolates exactly that variable:
same job, same shuffle fan-out, only bytes/row changes. Measured same
session: **0.682** — i.e. the honest shape-matched data-plane ceiling for
the engine's widest stream is ~0.68 on this box, and the engine sits at
0.549/0.682 = 0.81 of it. On a real cluster each executor brings its own
memory bus, so this loss is a single-box artifact (BENCH.md §1, §2d).

Usage: python bench/wide_plane_control.py [--cores 2,8] [--rows 40000000]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import time
import sys
sys.path.insert(0, {repo!r})
from simplecrawler_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app="wplane-{cores}", master="local[{cores}]",
                  shuffle_partitions=32,
                  extra={{"spark.sql.adaptive.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
df = (spark.range({rows})
      .withColumn("k", F.xxhash64("id") % 1000000)
      .withColumn("url", F.concat(
          F.lit("http://host"), (F.col("id") % F.lit(97)).cast("string"),
          F.lit(".example/path/segment/page-"), F.col("id").cast("string"),
          F.lit(".html")))
      .withColumn("depth", (F.col("id") % 12).cast("int")))
if {with_ref}:
    df = df.withColumn("ref", F.concat(
        F.lit("http://host"), (F.col("id") % F.lit(89)).cast("string"),
        F.lit(".example/path/other/page-"),
        F.floor(F.col("id") / F.lit(3)).cast("string"), F.lit(".html")))
else:
    df = df.withColumn("ref", F.lit(None).cast("string"))
t0 = time.time()
n = (df.repartition(32, "k")
       .groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                         F.max("url").alias("u"), F.max("ref").alias("r"),
                         F.sum("id").alias("s"))
       .agg(F.sum("n"), F.count("u")).collect())
print("SECONDS", time.time() - t0)
"""


def run_level(cores: int, rows: int, runs: int,
              with_ref: bool = True) -> list[float]:
    code = CHILD.format(repo=REPO, cores=cores, rows=rows,
                        with_ref=with_ref)
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    env = dict(os.environ, PYTHONPATH=REPO)
    secs = []
    for _ in range(runs):
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             check=True)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("SECONDS")][0]
        secs.append(round(float(line.split()[1]), 1))
    return secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--rows", type=int, default=40000000)
    ap.add_argument("--runs", type=int, default=3,
                    help="runs per level; first discarded as warm-up when >1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-ref", action="store_true",
                    help="drop the second url-like string (~105 B rows) — "
                         "the delta-schema-v2 candidate row shape, for the "
                         "new row width's same-session ceiling")
    args = ap.parse_args()
    lo, hi = (int(c) for c in args.cores.split(","))
    res = {}
    for cores in (lo, hi):
        secs = run_level(cores, args.rows, args.runs,
                         with_ref=not args.no_ref)
        res[cores] = secs
        print(json.dumps({"cores": cores, "seconds": secs}))
    timed = {c: (s[1:] if len(s) > 1 else s) for c, s in res.items()}
    m_lo = statistics.median(timed[lo])
    m_hi = statistics.median(timed[hi])
    summary = {"pair": f"{lo}v{hi}", "rows": args.rows,
               "row_shape": ("~105B: 1 url-like string + 3 numerics"
                             if args.no_ref else
                             "~150B: 2 url-like strings + 3 numerics"),
               "seconds": {str(c): res[c] for c in res},
               "speedup": round(m_lo / m_hi, 2),
               "wide_plane_ceiling_efficiency":
                   round(m_lo / m_hi / (hi / lo), 3)}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
