"""Generate TESTDATA.md-style synthetic tables at larger scale factors.

The driver ships read-only parquet at sf0.001/0.01/0.1; scale-curve
benchmarking (VERDICT r4 task #4) needs an sf1 step-up. This generator
reproduces the same schemas and distribution shapes (measured off the
sf0.1 tables: uniform keys, 5 even event types, mild user skew, 5-lang
document mix with a duplicated tail, 10 gaussian embedding clusters,
~4.1 lineitems/order) deterministically (numpy PCG64, fixed seed), but
it is NOT byte-identical to the driver's generator — use it for
performance curves, never for oracle correctness (the oracle gate stays
on the driver's sf0.01).

Usage: python tools/gen_testdata.py [sf] [out_dir]
Defaults: sf=1.0, out_dir=<repo>/testdata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["small", "large", "hot", "cold", "blue", "red", "old", "new", "green", "dim"]
NOUN = ["ring", "bolt", "plate", "widget", "gear", "cog", "pin", "cap", "rod", "hub"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
LANGS = [("en", 0.41), ("zh", 0.15), ("es", 0.15), ("fr", 0.15), ("de", 0.14)]
VOCAB = (
    "the a key agg row scan slow fast table value part hash merge batch spark "
    "line sort window customer query big data column join small group stream "
    "order filter select count index shuffle broadcast cache plan stage task"
).split()

DAY = np.timedelta64(1, "D").astype("timedelta64[us]").astype(np.int64)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_col(int_us: np.ndarray) -> pa.Array:
    return pa.array(int_us.astype("datetime64[us]"))


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": [
            f"{ADJ[i % 10]} {NOUN[(i // 10) % 10]}" for i in range(n_part)
        ],
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(900.0 + rng.uniform(0, 100, n_part), 1),
    }))

    date_lo = np.datetime64("1995-01-01", "us").astype(np.int64)
    date_hi = np.datetime64("2001-08-01", "us").astype(np.int64)
    odate = (
        date_lo
        + (rng.integers(0, (date_hi - date_lo) // DAY + 1, n_ord)) * DAY
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_col(odate),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # ~4.1 lines per order: 1 + Binomial(16, 0.19) matches sf0.1's mean/max
    lines_per = 1 + rng.binomial(16, 0.19, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_orderkey)
    l_linenumber = (np.arange(n_li) - np.repeat(
        np.concatenate(([0], np.cumsum(lines_per)[:-1])), lines_per
    ) + 1).astype(np.int32)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(l_linenumber),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * (900 + rng.uniform(0, 1200, n_li)), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(
            np.repeat(odate, lines_per) + rng.integers(1, 121, n_li) * DAY
        ),
    }))

    ev_lo = np.datetime64("2024-01-01", "us").astype(np.int64)
    ev_ts = np.sort(ev_lo + rng.integers(0, 30 * DAY, n_ev))
    n_users = max(int(n_ev / 66), 1)  # sf0.1: 100k events / 1500 users
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": _ts_col(ev_ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev).clip(0, 560), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    lang_names = [l for l, _ in LANGS]
    lang_p = np.array([p for _, p in LANGS])
    langs = np.array(lang_names)[rng.choice(len(LANGS), n_doc, p=lang_p / lang_p.sum())]
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.002:  # duplicated tail like the driver data
            texts.append(texts[rng.integers(0, i)])
            continue
        n_words = int(rng.integers(8, 90))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(langs),
        "source": pa.array([f"src{int(s)}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    centers = rng.normal(0, 0.08, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.09, (n_emb, 64))).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata",
        f"sf{sf:g}",
    )
    out = sys.argv[2] if len(sys.argv) > 2 else default_out
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
