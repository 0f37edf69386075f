#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall, per-stage task stats.

Usage: python3 tools/proflog.py <eventlog-file> [--stages]

Prints jobs in submission order with wall seconds, stage count, task
count, and the job group/description (the bench labels queries via
setJobDescription), so per-query fixed overhead (many small jobs) is
separable from real compute (few heavy stages).
"""
import json, sys, collections

path = sys.argv[1]
show_stages = "--stages" in sys.argv

jobs = {}            # id -> dict
stages = {}          # id -> dict

with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            props = e.get("Properties") or {}
            jobs[jid] = {
                "start": e["Submission Time"],
                "desc": props.get("spark.job.description", "")[:90],
                "stages": e.get("Stage IDs", []),
                "end": None,
            }
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"][:60],
                "tasks": si["Number of Tasks"],
                "start": si.get("Submission Time"),
                "end": si.get("Completion Time"),
            }

total = 0.0
for jid in sorted(jobs):
    j = jobs[jid]
    if j["end"] is None:
        continue
    wall = (j["end"] - j["start"]) / 1000.0
    total += wall
    ntasks = sum(stages.get(s, {}).get("tasks", 0) for s in j["stages"])
    nst = sum(1 for s in j["stages"] if s in stages)
    print(f"job {jid:4d} {wall:7.3f}s stages={nst:2d} tasks={ntasks:4d}  {j['desc']}")
    if show_stages:
        for s in j["stages"]:
            st = stages.get(s)
            if st and st.get("start") and st.get("end"):
                sw = (st["end"] - st["start"]) / 1000.0
                print(f"    stage {s:4d} {sw:7.3f}s tasks={st['tasks']:4d}  {st['name']}")
print(f"sum of job walls: {total:.2f}s  jobs={len(jobs)}")
