#!/usr/bin/env python
"""Summarize a Spark event log: per-stage wall/task time, GC, shuffle and
Python-worker time — used to find the serial (non-scaling) cost per crawl
round when chasing the north_rule efficiency gate."""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str, top: int = 25) -> None:
    stages = {}
    tmetrics: dict[int, defaultdict] = {}
    jobs = []
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = e["Timestamp"]
            elif ev == "SparkListenerApplicationEnd":
                app_end = e["Timestamp"]
            elif ev == "SparkListenerJobStart":
                jobs.append((e["Job ID"], e["Submission Time"], None,
                             [s["Stage ID"] for s in e["Stage Infos"]]))
            elif ev == "SparkListenerJobEnd":
                for i, j in enumerate(jobs):
                    if j[0] == e["Job ID"]:
                        jobs[i] = (j[0], j[1], e["Completion Time"], j[3])
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                name = si["Stage Name"].split("\n")[0]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[si["Stage ID"]] = {
                    "name": name, "tasks": si["Number of Tasks"],
                    "wall_ms": (comp - sub) if sub and comp else 0,
                }
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                s = tmetrics.setdefault(e["Stage ID"], defaultdict(int))
                s["task_ms"] += m.get("Executor Run Time", 0)
                s["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                s["gc_ms"] += m.get("JVM GC Time", 0)
                s["deser_ms"] += m.get("Executor Deserialize Time", 0)
                s["ser_ms"] += m.get("Result Serialization Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                s["shuffle_write_ms"] += sw.get("Shuffle Write Time", 0) // 1_000_000
                sr = m.get("Shuffle Read Metrics") or {}
                s["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)

    wall = (app_end - app_start) / 1000 if app_start and app_end else None
    job_wall = sum((j[2] - j[1]) for j in jobs if j[2]) / 1000
    gaps = 0.0
    last_end = None
    for _, sub, comp, _ in sorted(jobs, key=lambda j: j[1]):
        if comp is None:
            continue
        if last_end is not None and sub > last_end:
            gaps += (sub - last_end) / 1000
        last_end = max(last_end or 0, comp)
    print(f"app wall: {wall}s  sum(job wall): {job_wall:.1f}s  "
          f"between-job gaps (pure driver time): {gaps:.1f}s  jobs: {len(jobs)}")

    agg = defaultdict(lambda: defaultdict(float))
    for sid, s in stages.items():
        if not isinstance(s, dict) or "name" not in s:
            continue
        a = agg[s["name"]]
        a["n"] += 1
        a["wall_ms"] += s["wall_ms"]
        a["tasks"] += s["tasks"]
        for k, v in tmetrics.get(sid, {}).items():
            a[k] += v
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["wall_ms"])[:top]
    print(f"{'stage':58s} {'n':>3} {'tasks':>5} {'wall_s':>7} {'task_s':>8} "
          f"{'cpu_s':>7} {'gc_s':>6} {'shufw_s':>7} {'wait_s':>6}")
    for name, a in rows:
        print(f"{name[:58]:58s} {int(a['n']):>3} {int(a['tasks']):>5} "
              f"{a['wall_ms']/1000:>7.1f} {a['task_ms']/1000:>8.1f} "
              f"{a['cpu_ms']/1000:>7.1f} "
              f"{a['gc_ms']/1000:>6.1f} {a['shuffle_write_ms']/1000:>7.1f} "
              f"{a['fetch_wait_ms']/1000:>6.1f}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
