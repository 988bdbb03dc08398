"""Per-job breakdown for one queries() entry: job start order, stage/task
counts and wall per job via the status tracker + a listener-free repoll.

Usage: python tools/job_breakdown.py NAME [--sf SF_DIR]

Warm at sf0.001, then ONE timed run at the target SF inside a job group;
afterwards walk the group's job ids and print each job's stages and task
counts. Wall per job is not exposed by the status tracker, so this prints
the submission-ordered list with task totals — the deterministic signal
for "how many driver round trips and how many tasks each paid".
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as E


def main() -> None:
    argv = list(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    name = argv[0]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = B._build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fn = E.queries()[name]
    warm = B._warm_dir(sf_dir)
    try:
        fn(spark, warm).collect()
    except Exception as ex:
        print(f"# warm error: {ex}", file=sys.stderr)

    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    group = f"bd:{name}"
    spark.sparkContext.setJobGroup(group, name)
    t0 = time.time()
    fn(spark, sf_dir).collect()
    dt = time.time() - t0
    spark.sparkContext.setJobGroup(None, None)

    st = spark.sparkContext.statusTracker()
    jids = sorted(st.getJobIdsForGroup(group) or [])
    total_tasks = 0
    rows = []
    for j in jids:
        ji = st.getJobInfo(j)
        if ji is None:
            rows.append((j, "?", []))
            continue
        stages = []
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is not None:
                stages.append((sid, si.numTasks))
                total_tasks += si.numTasks
        rows.append((j, ji.status, stages))
    print(json.dumps({"name": name, "sec": round(dt, 3), "jobs": len(jids),
                      "total_tasks": total_tasks}))
    for j, status, stages in rows:
        stage_txt = " ".join(f"s{sid}:{nt}t" for sid, nt in stages)
        print(f"  job {j}: {status} {stage_txt}")
    spark.stop()


if __name__ == "__main__":
    main()
