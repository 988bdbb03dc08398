"""Emit SCALE.md: per-query wall-clock growth between two bench records.

Usage: python tools/scale_report.py BENCH_A.json BENCH_B.json [out.md]

A = smaller scale factor, B = larger. The data volume ratio comes from
the records' "sf" fields; a query whose wall grew faster than the data
(growth > sf ratio) is flagged super-linear — that list is the next
optimization queue (VERDICT r4 task #4). Queries dominated by fixed
overhead at small SF naturally show growth << ratio; those are fine.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALE.md"
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    ratio = b["sf"] / a["sf"]
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    # totals are only comparable over the SAME query set: a partially
    # failed isolated run (bench.py records its `failed` list) would
    # otherwise yield a misleading growth ratio (ADVICE r6). Ratio over
    # the intersection; surface any asymmetry loudly.
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    if only_a or only_b:
        print(
            f"WARNING: query sets differ — only in A: {only_a or '[]'}, "
            f"only in B: {only_b or '[]'}; totals computed over the "
            f"{len(shared)}-query intersection",
            file=sys.stderr,
        )
    total_a = sum(qa[q] for q in shared)
    total_b = sum(qb[q] for q in shared)
    rows = []
    for q in shared:
        growth = qb[q] / qa[q] if qa[q] > 0 else float("inf")
        rows.append((q, qa[q], qb[q], growth))
    rows.sort(key=lambda r: -r[3])
    supra = [r for r in rows if r[3] > ratio]

    lines = [
        "# SCALE — wall-clock growth vs data growth",
        "",
        f"Benchmarks: sf{a['sf']:g} ({total_a:.1f} s, {len(shared)} shared queries)"
        f" vs sf{b['sf']:g} ({total_b:.1f} s), data ratio {ratio:g}x, local[32], "
        + (
            "bench.py --isolate (fresh JVM per query, warmup inside — immune "
            "to cross-query JIT/codecache/GC contamination)."
            if a.get("isolated") and b.get("isolated")
            else "bench.py frozen methodology."
        )
        + (
            f" NOTE: query sets differ (A-only: {only_a}, B-only: {only_b});"
            " totals cover the intersection only."
            if only_a or only_b
            else ""
        ),
        "",
        f"Total wall grew {total_b / total_a:.2f}x for {ratio:g}x the data"
        " (sub-linear overall: fixed per-query overhead — job launch, codegen,"
        " Python round-trips — amortizes as partitions fill).",
        "",
        f"## Super-linear queries (growth > {ratio:g}x) — the optimization queue",
        "",
    ]
    if supra:
        lines += [
            "| query | " f"sf{a['sf']:g} s | sf{b['sf']:g} s | growth |",
            "|---|---|---|---|",
        ]
        lines += [
            f"| {q} | {ta:.2f} | {tb:.2f} | {g:.1f}x |" for q, ta, tb, g in supra
        ]
    else:
        lines.append("(none — every query grew slower than the data)")
    lines += [
        "",
        "## All shared queries, fastest-growing first",
        "",
        "| query | " f"sf{a['sf']:g} s | sf{b['sf']:g} s | growth |",
        "|---|---|---|---|",
    ]
    lines += [f"| {q} | {ta:.2f} | {tb:.2f} | {g:.1f}x |" for q, ta, tb, g in rows]
    lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}: {len(supra)} super-linear of {len(rows)} shared")


if __name__ == "__main__":
    main()
