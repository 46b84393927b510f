#!/usr/bin/env python
"""Spark data-plane control for the N→4N pair: a pure JVM shuffle+agg job
(no Python, no engine code) at pinned core levels. Its scaling is the
ceiling Spark-local's data plane (hash shuffle write/read, whole-stage agg,
one shared memory bus) allows on this box — the envelope against which the
crawl engine's mixed JVM+Python rounds must be read. On a real cluster each
executor adds its own memory bus; this loss is a single-box artifact.

Usage: python bench/spark_plane_control.py [--cores 2,8] [--rows 120000000]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, rows: int) -> float:
    code = f"""
import time
from simplecrawler_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app="plane-{cores}", master="local[{cores}]", shuffle_partitions=32,
                  extra={{"spark.sql.adaptive.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
df = spark.range({rows}).withColumn("k", F.xxhash64("id") % 1000000)
t0 = time.time()
n = (df.repartition(32, "k")
       .groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
       .agg(F.sum("n"), F.sum("s")).collect())
print("SECONDS", time.time() - t0)
"""
    cmd = [sys.executable, "-c", code]
    import shutil as _sh
    if _sh.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env=dict(os.environ, PYTHONPATH=REPO), check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("SECONDS")][-1]
    return float(line.split()[1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--rows", type=int, default=120_000_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    levels = [int(c) for c in args.cores.split(",")]
    res = {}
    for c in levels:
        secs = [run_level(c, args.rows) for _ in range(args.runs)]
        res[c] = min(secs)
        print(json.dumps({"cores": c, "seconds": [round(s, 1) for s in secs]}), flush=True)
    lo, hi = min(levels), max(levels)
    eff = res[lo] / ((hi / lo) * res[hi])
    print(json.dumps({"pair": f"{lo}v{hi}", "speedup": round(res[lo]/res[hi], 2),
                      "plane_ceiling_efficiency": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
