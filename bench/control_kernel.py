#!/usr/bin/env python
"""Hardware-envelope control for the N→4N scaling pair (BENCH.md §1/§2).

Runs the engine's dominant per-URL kernel — vectorized link cleanup +
RFC-3986 canonicalization + 64-bit hashing over pandas batches — as plain
pinned multiprocessing with NO Spark, no shuffle, no driver: an
embarrassingly-parallel workload whose only scaling losses are the box's
(memory bandwidth, all-core clock droop). Its efficiency at a core pair is
the HARDWARE CEILING for that pair; engine efficiency should be read
against it (engine_eff / control_eff = the engine's own scaling quality).

Usage: python bench/control_kernel.py [--cores 2,8] [--urls-per-proc 120000]
Prints one JSON line per level plus a summary with ceiling efficiencies.
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _work(args):
    n, seed, reps = args
    import numpy as np
    import pandas as pd

    from simplecrawler_spark.functions.links import clean_expand_series

    rng = np.random.Generator(np.random.PCG64(seed))
    hosts = [f"host{h}.example" for h in range(8)]
    raw = []
    base = []
    for i in range(n):
        h = hosts[int(rng.integers(8))]
        base.append(f"http://{h}/p/{int(rng.integers(5000))}")
        raw.append([f"/p/{int(rng.integers(5000))}",
                    f"../p/./{int(rng.integers(5000))}#f",
                    f"HTTP://{h.upper()}:80/p/../p/{int(rng.integers(5000))}?b=2&a=1",
                    f"//{hosts[int(rng.integers(8))]}/p/{int(rng.integers(5000))}",
                    "mailto:x@y.z"])
    links = pd.Series(raw)
    bases = pd.Series(base)
    t0 = time.time()
    out = 0
    for _ in range(reps):
        res = clean_expand_series(links, bases)
        out += sum(len(x) for x in res)
    return out, time.time() - t0


def run_level(cores: int, n: int, reps: int) -> float:
    os.sched_setaffinity(0, set(range(cores)))
    with mp.get_context("spawn").Pool(cores) as p:
        t0 = time.time()
        res = p.map(_work, [(n, 1000 + i, reps) for i in range(cores)])
        wall = time.time() - t0
    total_pages = cores * n * reps
    return total_pages / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="1,2,4,8")
    ap.add_argument("--pages-per-proc", type=int, default=60000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    levels = [int(c) for c in args.cores.split(",")]
    rates = {}
    for c in levels:
        rates[c] = run_level(c, args.pages_per_proc, args.reps)
        print(json.dumps({"cores": c, "pages_per_sec": round(rates[c], 1)}), flush=True)
    pairs = {}
    for lo in levels:
        hi = lo * 4
        if hi in rates:
            pairs[f"{lo}v{hi}"] = round(rates[hi] / (4 * rates[lo]), 3)
    print(json.dumps({"ceiling_efficiency": pairs}), flush=True)


if __name__ == "__main__":
    main()
