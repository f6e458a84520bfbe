#!/usr/bin/env python3
"""Summarize a Spark event log: jobs / stages / tasks / task-time per
job description (opt_probe sets description = probe:<query>).

Usage: python scripts/joblog_summary.py /tmp/spark-events/<app-file>
"""
from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str) -> None:
    per = defaultdict(lambda: {"jobs": 0, "stages": 0, "tasks": 0,
                               "task_ms": 0, "shuffle_write": 0,
                               "shuffle_read": 0})
    job_desc: dict[int, str] = {}
    stage_to_desc: dict[int, str] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "<none>")
                jid = ev["Job ID"]
                job_desc[jid] = desc
                per[desc]["jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    stage_to_desc[sid] = desc
            elif et == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                desc = stage_to_desc.get(info["Stage ID"], "<none>")
                per[desc]["stages"] += 1
                per[desc]["tasks"] += info.get("Number of Tasks", 0)
            elif et == "SparkListenerTaskEnd":
                desc = stage_to_desc.get(ev.get("Stage ID", -1), "<none>")
                ti = ev.get("Task Info", {})
                per[desc]["task_ms"] += max(
                    0, ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
                tm = ev.get("Task Metrics") or {}
                sw = (tm.get("Shuffle Write Metrics") or {})
                per[desc]["shuffle_write"] += sw.get(
                    "Shuffle Bytes Written", 0)
                sr = (tm.get("Shuffle Read Metrics") or {})
                per[desc]["shuffle_read"] += (
                    sr.get("Local Bytes Read", 0)
                    + sr.get("Remote Bytes Read", 0))
    rows = sorted(per.items(), key=lambda kv: -kv[1]["task_ms"])
    print(f"{'desc':44s} {'jobs':>4} {'stg':>4} {'task':>5} "
          f"{'task_s':>7} {'shW_kB':>8} {'shR_kB':>8}")
    for desc, m in rows:
        print(f"{desc[:44]:44s} {m['jobs']:4d} {m['stages']:4d} "
              f"{m['tasks']:5d} {m['task_ms']/1000:7.1f} "
              f"{m['shuffle_write']//1024:8d} {m['shuffle_read']//1024:8d}")


if __name__ == "__main__":
    main(sys.argv[1])
