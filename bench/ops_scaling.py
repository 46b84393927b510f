#!/usr/bin/env python
"""Data-plane scaling evidence #2: the operator suite (content dedup +
similarity + text analysis — single wide jobs, no round barriers) at two
pinned parallelism levels. Complements bench/scaling.py (the BSP crawl,
which at sandbox round sizes is stage-latency-bound; see BENCH.md analysis).

    python bench/ops_scaling.py            # runs 8 then 32, prints JSON
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from simplecrawler_spark.session import get_spark
import __spark_entry__ as em
cores = int(sys.argv[1])
spark = get_spark(app=f"ops{{cores}}", master=f"local[{{cores}}]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf = {sf!r}
names = ["minhash_near_dup", "simhash_near_dup", "dedup_exact", "text_quality",
         "lang_id", "fingerprints", "embed_near_dup", "u3_first_wins", "j4_fetch_join"]
qs = em.queries()
# warm (JIT, file listing, python workers) on a cheap query
qs["dedup_exact"](spark, sf).write.format("noop").mode("overwrite").save()
t_each = {{}}
t0 = time.time()
for n in names:
    s = time.time()
    qs[n](spark, sf).write.format("noop").mode("overwrite").save()
    t_each[n] = round(time.time() - s, 2)
print(json.dumps({{"cores": cores, "total_sec": round(time.time() - t0, 2),
                   "each": t_each}}))
"""


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    script = CHILD.format(repo=REPO, sf=sf)
    out = {}
    for cores in (2, 8):
        cmd = [sys.executable, "-c", script, str(cores)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True,
                           env=dict(os.environ, PYTHONPATH=REPO), check=True)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[cores] = json.loads(line)
        print(line, flush=True)
    eff = (out[2]["total_sec"] / out[8]["total_sec"]) / 4.0
    summary = {"suite": "ops", "sf_dir": sf, "t_low": out[2]["total_sec"],
               "t_high": out[8]["total_sec"],
               "speedup": round(out[2]["total_sec"] / out[8]["total_sec"], 2),
               "efficiency_vs_4x": round(eff, 3)}
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "ops_scaling.json"), "w") as f:
        json.dump({"summary": summary, "detail": out}, f, indent=2)


if __name__ == "__main__":
    main()
