"""Per-job / per-stage decomposition of a Spark event-log directory, grouped
by job description (``setJobDescription``). Companion to stage_scaling.py for
single-run analysis: which jobs a query runs, their wall times, and the
slowest stages inside each.

Usage:
    python tools/job_decomp.py <evlog_dir_or_file> [desc_filter]

Handles Spark 4 rolling logs; .zstd files are decompressed via the zstd CLI
into a temp dir when no zstandard module is available.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
from collections import defaultdict


def event_files(root: str) -> list[str]:
    if os.path.isfile(root):
        paths = [root]
    else:
        paths = [
            p
            for p in glob.glob(root + "/**", recursive=True)
            if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
        ]
    out = []
    tmp = None
    for p in sorted(paths):
        if p.endswith(".zstd"):
            if tmp is None:
                tmp = tempfile.mkdtemp(prefix="evlog_")
            dst = os.path.join(tmp, os.path.basename(p)[: -len(".zstd")])
            subprocess.run(["zstd", "-d", "-f", p, "-o", dst], check=True,
                           capture_output=True)
            out.append(dst)
        else:
            out.append(p)
    return out


def load(root: str):
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    task_time: dict[int, float] = defaultdict(float)
    for path in event_files(root):
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerJobStart"' in line:
                    ev = json.loads(line)
                    jobs[ev["Job ID"]] = {
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        ),
                        "start": ev["Submission Time"],
                        "end": None,
                        "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    }
                elif '"SparkListenerJobEnd"' in line:
                    ev = json.loads(line)
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
                elif '"SparkListenerStageCompleted"' in line:
                    ev = json.loads(line)
                    info = ev["Stage Info"]
                    stages[info["Stage ID"]] = {
                        "name": info["Stage Name"].split("\n")[0],
                        "tasks": info["Number of Tasks"],
                        "wall": (
                            info.get("Completion Time", 0)
                            - info.get("Submission Time", 0)
                        )
                        / 1000.0,
                    }
                elif '"SparkListenerTaskEnd"' in line:
                    ev = json.loads(line)
                    m = ev.get("Task Metrics") or {}
                    task_time[ev["Stage ID"]] += m.get("Executor Run Time", 0) / 1000.0
    return jobs, stages, task_time


def main() -> int:
    root = sys.argv[1]
    flt = sys.argv[2] if len(sys.argv) > 2 else None
    jobs, stages, task_time = load(root)
    bydesc: dict[str, list] = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        if j["end"] is None:
            continue
        bydesc[j["desc"] or "(none)"].append((jid, j))
    for desc, js in bydesc.items():
        if flt and flt not in desc:
            continue
        wall = sum((j["end"] - j["start"]) / 1000.0 for _, j in js)
        print(f"\n== {desc}  jobs={len(js)} wall_sum={wall:.2f}s")
        for jid, j in js:
            jw = (j["end"] - j["start"]) / 1000.0
            run_stages = [
                (sid, stages[sid]) for sid in j["stages"] if sid in stages
            ]
            run_stages.sort(key=lambda s: -s[1]["wall"])
            top = "; ".join(
                f"s{sid} {st['wall']:.2f}s/{st['tasks']}t tt={task_time[sid]:.1f} {st['name'][:40]}"
                for sid, st in run_stages[:3]
            )
            print(f"  job {jid:4d} wall={jw:6.2f}s  {top}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
