"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "sf", "n_queries"}.

The final stdout line is TOTALS-ONLY (~100 bytes) so the driver's ~2 KB
tail capture always parses it — rounds 3-5 embedded the 112-entry
per-query map (~2.7 KB) in that line and the driver recorded
"parsed": null three rounds running. The per-query map + JVM telemetry
live in BENCH_local_latest.json next to this file.

The value is total wall-clock seconds over all headline queries (each
executed to completion via a count/collect action).

Modes:
  python bench.py                 default: one JVM, warmup pass, best-of-2
  python bench.py --isolate       fresh JVM per query (subprocess), warmup
                                  inside each; immune to cross-query JIT /
                                  codecache / GC contamination — use for
                                  SCALE.md growth curves
  python bench.py --isolate --reps N
                                  min over N whole-JVM repetitions per
                                  query (default 3). Round-7 judge reruns
                                  showed single-rep isolated records carry
                                  up to 1.6x host noise (scc_parts: 6.18s
                                  recorded, 3.86s min-of-3) — reps>=3 is
                                  the default since round 8. NOTE: records
                                  with "reps": 3 are NOT comparable to the
                                  pre-r8 single-rep BENCH_local_iso_* files;
                                  both SFs were re-baselined in r8.
  python bench.py --one NAME      (internal) time a single query in this
                                  process; prints {"name", "sec"}

METHODOLOGY — FROZEN since round 2 (commit 5ac75a0) so cross-round
numbers stay comparable; do not change without re-baselining every prior
BENCH_r*.json:

1. one full UNTIMED warmup pass over every query (JIT, parquet footer
   cache, Python worker pool spin-up), then
2. each query timed twice, best-of-2 recorded;
3. per-query work is never reduced to improve numbers (e.g. iteration
   counts stay as the operator's documented defaults) — a faster bench
   must come from a faster plan, not less work;
3b. (r9 measurement fix, documented in OPTIMIZATION_r09.md) the JIT
   compile queue is drained UNTIMED after the warmup pass and briefly
   before each timed rep (_drain_jit): the 117-shape warmup's C2 backlog
   measurably landed inside the first ~15 timed queries (3-5x inflation,
   and it reversed the 8-vs-32-core scaling signal). The timed region,
   action and best-of-2 are unchanged;
4. queries run in queries() dict order with _HEAVY_LAST plan shapes at
   the end (their codegen volume pollutes the JIT for whatever runs
   next);
5. the bench process must run alone — concurrent work on the same box
   (even a pytest run) inflates individual query walls by 2-5x.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import __spark_entry__ as E


def _jvm_stats(spark) -> tuple[int, int, int]:
    """(gc_count, gc_time_ms, codecache_used_bytes) via the JVM's
    management beans — telemetry only (never affects timing), so
    cross-round deltas can separate plan regressions from session noise
    (GC pressure, code-cache growth) without re-running anything."""
    try:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        gc_count = gc_time = code_used = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            b = it.next()
            gc_count += max(0, b.getCollectionCount())
            gc_time += max(0, b.getCollectionTime())
        it = mf.getMemoryPoolMXBeans().iterator()
        while it.hasNext():
            p = it.next()
            name = p.getName()
            if "CodeHeap" in name or "Code Cache" in name:
                code_used += p.getUsage().getUsed()
        return gc_count, gc_time, code_used
    except Exception:
        return -1, -1, -1


def _build_session(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cypher-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.crossJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        # 32 distinct query shapes generate enough classes to exhaust the
        # default 240m JIT code cache mid-run, after which execution falls
        # back to the interpreter and late queries stall for seconds
        .config(
            "spark.driver.extraJavaOptions",
            # 2g: 78 warmed query shapes' compiled methods no longer fit
            # in 1g, and once UseCodeCacheFlushing starts evicting, hot
            # nested-loop methods run interpreted (measured: the cosine
            # pair scan bimodally 1.7s vs 41s across otherwise identical
            # solo runs).
            # G1HeapRegionSize=32m (the JVM max): at 48g heap the default
            # region is 16m, so every >8m object is humongous — and the
            # iterative loops' single-partition cached static blocks plus
            # localCheckpoint block arrays are exactly that size class.
            # Humongous churn caused multi-second G1 stalls landing on
            # random reps (measured r9: cc_order_chains 5.5-28.6s across
            # identical reps with 0.3-1.6s GC inside; with 32m regions
            # 4.9-6.1s with <0.2s GC — both variance and floor improve)
            "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing "
            "-XX:G1HeapRegionSize=32m",
        )
        # the generated-class cache defaults to 100 entries; 41 warmed query
        # shapes à several codegen units thrash the LRU and the biggest
        # classes (32-agg minhash, shingle transforms) recompile mid-run,
        # with Janino contending against 32 busy cores
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # PySpark 4's DataFrame-debugging wrapper pays ~3 py4j round trips
        # per DataFrame API call (getActiveSession + conf.get + origin
        # set/clear) purely to enrich error messages with the Python call
        # site. Plan building is driver-side Python; measured 3x faster
        # plan builds with it off (5080 -> 1880 py4j calls / 10 plans).
        # Static conf, so it must be set at session build. Scale-neutral:
        # this removes constant per-call driver overhead, changes no plan.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _warm_dir(sf_dir: str) -> str:
    warm = "/root/testdata/sf0.001"
    return warm if os.path.isdir(warm) else sf_dir


def _drain_jit(spark, max_wait: float, stable_polls: int = 3, poll_s: float = 0.3) -> float:
    """Wait (UNTIMED) until the JVM's JIT compile queue goes quiet, capped
    at ``max_wait`` seconds. Returns seconds waited.

    Measurement-accuracy fix (r9): the warmup pass enqueues C2 compilation
    for 117 query shapes, and the queue keeps draining long after the pass
    ends — with local[32] task slots saturating every core, the compile
    threads contend with the first TIMED queries, which measured 3-5x
    inflated (pricing_summary 3.85 s in-run vs 0.78 s isolated; 10.8 s of
    compile time landed inside its timed reps in a controlled probe). The
    effect is position-dependent noise, not query cost: it charges query N
    for query M's compilation, and it reverses the core-count scaling
    signal (at CPUS=8 the idle cores absorb the compile threads, which is
    why 8-core suite totals beat 32-core ones in round 8). Draining the
    queue between warmup and timing (and briefly between reps) makes the
    timed region measure the query, not the JIT backlog. The timed region
    itself is unchanged: same warmup pass, same best-of-2, same collect()."""
    try:
        cmx = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()
        t0 = time.time()
        prev = cmx.getTotalCompilationTime()
        stable = 0
        while time.time() - t0 < max_wait:
            time.sleep(poll_s)
            cur = cmx.getTotalCompilationTime()
            # compilation time is summed across compiler threads; < 20 ms
            # growth per poll means the queue is effectively idle
            if cur - prev < 20:
                stable += 1
                if stable >= stable_polls:
                    break
            else:
                stable = 0
            prev = cur
        return time.time() - t0
    except Exception:
        return 0.0


def _time_query(spark: SparkSession, fn, sf_dir: str) -> float | None:
    """Frozen per-query methodology: best-of-2, gc + cache-clear + JVM gc
    nudge before each timed run (see module docstring / round-2 notes)."""
    best = None
    for _ in range(2):
        gc.collect()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        _drain_jit(spark, max_wait=2.0)
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            dt = time.time() - t0
        except Exception as ex:
            print(
                f"# bench error: {type(ex).__name__}: {str(ex)[:200]}",
                file=sys.stderr,
            )
            return None
        best = dt if best is None else min(best, dt)
    return best


def _run_one(name: str, sf_dir: str, cpus: str) -> None:
    """Isolated-mode worker: fresh JVM, warm only this query, time it,
    print a one-line JSON {"name", "sec"}."""
    queries = E.queries()
    if name not in queries:
        print(json.dumps({"name": name, "sec": None, "err": "unknown query"}))
        return
    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fn = queries[name]
    warm = _warm_dir(sf_dir)
    try:
        fn(spark, warm).collect()
    except Exception:
        pass
    gc.collect()
    spark.catalog.clearCache()
    _drain_jit(spark, max_wait=30.0)
    best = _time_query(spark, fn, sf_dir)
    print(
        json.dumps({"name": name, "sec": None if best is None else round(best, 3)}),
        flush=True,
    )
    try:
        spark.stop()
    except Exception:
        pass


def _run_isolated(sf_dir: str, cpus: str, sf: float, reps: int = 3) -> None:
    """Fresh JVM per query via subprocess — removes cross-query JIT/
    codecache/GC contamination (measured 2x swings in both directions in
    the shared-session sf1 record; see SCALE.md). Each query runs in
    ``reps`` independent JVMs and the MIN wall is recorded: whole-run host
    noise (CPU steal, page cache pressure from neighbors) hits any single
    JVM run with up to 1.6x inflation (round-7 judge reruns), and min-of-N
    drives the noise probability to its Nth power. Slower wall-clock, only
    used for scale studies, never the driver bench."""
    import subprocess

    me = os.path.abspath(__file__)
    timings: dict[str, float] = {}
    failed: list[str] = []
    total = 0.0
    for name in E.queries():
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["SPARK_GRAFT_CPUS"] = cpus
        best: float | None = None
        for rep in range(max(1, reps)):
            try:
                proc = subprocess.run(
                    [sys.executable, me, "--one", name],
                    env=env,
                    capture_output=True,
                    text=True,
                    timeout=1800,
                )
                line = proc.stdout.strip().rsplit("\n", 1)[-1]
                rec = json.loads(line)
            except Exception as ex:
                print(f"# isolate error in {name} rep {rep}: {ex}", file=sys.stderr)
                continue
            if rec.get("sec") is not None:
                best = rec["sec"] if best is None else min(best, rec["sec"])
        if best is None:
            print(f"# isolate: {name} failed", file=sys.stderr)
            failed.append(name)
            continue
        timings[name] = best
        total += best
        print(f"# {name}: {best}s (min of {reps})", file=sys.stderr)
    # failed names travel with the record: two isolated records are only
    # total-comparable over the same query set, and scale_report refuses
    # to ratio totals when the sets differ (ADVICE r6)
    _emit(total, timings, {}, sf, isolated=True, failed=failed, reps=reps)


def _emit(
    total: float,
    timings: dict[str, float],
    jvm_stats: dict[str, dict],
    sf: float,
    isolated: bool = False,
    failed: list[str] | None = None,
    reps: int | None = None,
) -> None:
    # Final stdout line is TOTALS-ONLY (~100 bytes): the driver's tail
    # capture is ~2 KB and rounds 3-5 lost the record to truncation when
    # the per-query map was embedded. Per-query timings go to
    # BENCH_local_latest.json (or BENCH_local_isolated.json).
    compact_rec = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
    }
    if failed:
        compact_rec["failed"] = len(failed)
    compact = json.dumps(compact_rec, separators=(",", ":"))
    full_rec = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "isolated": isolated,
        "jvm": jvm_stats,
        "failed": failed or [],
    }
    if reps is not None:
        # reps >= 3 records (round 8+) are NOT comparable to the single-rep
        # isolated files from earlier rounds
        full_rec["reps"] = reps
    full = json.dumps(full_rec)
    fname = "BENCH_local_isolated.json" if isolated else "BENCH_local_latest.json"
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), fname), "w"
        ) as f:
            f.write(full + "\n")
    except Exception:
        pass
    print(compact, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    if "--one" in sys.argv:
        _run_one(sys.argv[sys.argv.index("--one") + 1], sf_dir, cpus)
        return
    if "--isolate" in sys.argv:
        reps = 3
        if "--reps" in sys.argv:
            reps = int(sys.argv[sys.argv.index("--reps") + 1])
        _run_isolated(sf_dir, cpus, sf, reps=reps)
        return

    spark = _build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = E.queries()

    # warm-up: run EVERY query once at the smallest scale factor so each
    # plan shape's whole-stage codegen + JIT compilation happens before
    # timing. With local[32] saturating every core, the C2 compiler
    # threads starve mid-run and cold queries execute interpreted for
    # seconds (measured 3-5x nondeterministic swings on the heavy text
    # pipelines); compile cost is a session constant, not a query cost.
    warm_dir = _warm_dir(sf_dir)
    try:
        E.entry.__globals__["_graph"](spark, sf_dir)
        spark.range(1).count()
    except Exception:
        pass
    for name, fn in queries.items():
        try:
            fn(spark, warm_dir).collect()
        except Exception:
            pass
    gc.collect()
    spark.catalog.clearCache()
    # let the 117-shape warmup's C2 compile backlog drain before timing
    # starts — it otherwise lands inside the first ~15 timed queries
    # (see _drain_jit; untimed, the timed methodology is unchanged)
    _drain_jit(spark, max_wait=120.0, stable_polls=5)

    timings: dict[str, float] = {}
    jvm_stats: dict[str, dict] = {}
    total = 0.0
    for name, fn in queries.items():
        best = None
        gc0, gct0, _cc0 = _jvm_stats(spark)
        # best-of-2: the host VM sees bursty CPU steal (measured multi-
        # second penalties landing on a random query each run); the min of
        # two runs estimates the true cost with the burst probability
        # squared
        for _ in range(2):
            # drain Python-side finalizers now: thousands of temp Column
            # objects from the previous query otherwise flood the py4j
            # gateway with detach calls in the middle of the next
            # collect(); drop cached blocks so per-operator persists don't
            # accumulate memory pressure
            gc.collect()
            spark.catalog.clearCache()
            # Python gc never triggers JVM gc: without this nudge the JVM
            # accumulates dead broadcast/localCheckpoint blocks and query
            # codegen classes across the 75-query run, and ContextCleaner
            # (which acts on JVM gc) never fires — measured: the late
            # compute-dense queries degrade several-fold (cosine_dup_pairs
            # 2.6s -> 17.4s by suite position alone; 1.8s isolated)
            spark.sparkContext._jvm.System.gc()
            # brief JIT-queue drain so rep 2 isn't timed against rep 1's
            # compile backlog (bounded; see _drain_jit)
            _drain_jit(spark, max_wait=2.0)
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.collect()
                dt = time.time() - t0
            except Exception as ex:  # a failing query is missing, not 0s
                print(
                    f"# bench error in {name}: {type(ex).__name__}: {str(ex)[:200]}",
                    file=sys.stderr,
                )
                break
            best = dt if best is None else min(best, dt)
        if best is None:
            continue
        timings[name] = round(best, 3)
        gc1, gct1, cc1 = _jvm_stats(spark)
        jvm_stats[name] = {
            "gc_n": gc1 - gc0,
            "gc_ms": gct1 - gct0,
            "codecache_mb": round(cc1 / (1 << 20), 1),
        }
        total += best

    _emit(total, timings, jvm_stats, sf)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
