"""Per-query profiler for the optimization rounds: wall time, Spark
job/stage counts, and .explain("formatted") capture.

Usage:
  python tools/profile_query.py [--plans DIR --suffix before] [--sf SF_DIR] name [name ...]

For each named queries() entry: build the bench session (same confs as
bench.py), warm at sf0.001, time best-of-2 at the target SF (collect(),
the frozen bench action), and report how many jobs/stages the timed run
launched (statusTracker delta) — the per-round fixed-cost signal the
local bench is most sensitive to. With --plans the post-warmup
explain("formatted") is written to DIR/<name>_<suffix>.txt.
"""

from __future__ import annotations

import gc
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B
import __spark_entry__ as E


def main() -> None:
    argv = list(sys.argv[1:])
    plans_dir = None
    suffix = "before"
    if "--plans" in argv:
        i = argv.index("--plans")
        plans_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    names = argv
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = B._build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = E.queries()
    warm = B._warm_dir(sf_dir)
    st = spark.sparkContext.statusTracker()

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            fn(spark, warm).collect()
        except Exception as ex:
            print(f"# warm error {name}: {ex}", file=sys.stderr)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            try:
                df = fn(spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                    f.write(buf.getvalue())
            except Exception as ex:
                print(f"# explain error {name}: {ex}", file=sys.stderr)
        best = None
        jobs = 0
        for rep in range(2):
            gc.collect()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            B._drain_jit(spark, max_wait=8.0)
            group = f"prof:{name}:{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.collect()
            dt = time.time() - t0
            nj = len(st.getJobIdsForGroup(group) or [])
            spark.sparkContext.setJobGroup(None, None)
            if best is None or dt < best:
                best = dt
                jobs = nj
        out[name] = {"sec": round(best, 3), "jobs": jobs}
        print(json.dumps({"name": name, **out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
