"""Generate an sf-ALIKE synthetic dataset for round-6 perf measurement.

The driver's round-end bench runs at a driver-generated scale factor
(BENCH_r05.json: sf=1.0) that is not present under /root/testdata (which
is read-only and must not be regenerated). This script synthesizes tables
with the same schemas and closely matched distributions (vocab, dup-doc
rate, unit-norm embeddings, key ranges) at an arbitrary scale so that
superlinear blowups that are invisible at sf0.1 show up locally.

Row VALUES do not match the driver's generator (unknown RNG); correctness
stays pinned by the sf0.01 oracle sweep. This data is for timing only.

Usage: python tools/gen_scale_testdata.py [SF] [OUTDIR]
       python tools/gen_scale_testdata.py 1.0 /tmp/testdata_sf1.0
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJ = "large hot small cold light heavy dark pale fresh dry".split()
NOUN = "ring bolt screw nut washer plate rod pin gear cap".split()


def write(path: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{path}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/testdata_sf{sf}"
    import os

    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(1234)

    n_docs = int(50000 * sf)
    n_emb = int(20000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15000 * sf)
    n_cust = int(150_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)

    # --- documents ---
    n_words = rng.integers(10, 101, n_docs)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_docs):
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words[i])]))
    # 5% dups: doc i copies an earlier doc + " dup"
    n_dup = n_docs // 20
    dup_ids = rng.choice(np.arange(n_docs // 10, n_docs), n_dup, replace=False)
    for d in dup_ids:
        texts[d] = texts[rng.integers(0, n_docs // 10)] + " dup"
    doc_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(LANGS, n_docs, p=LANG_W)),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    write(out, "documents", doc_tbl)

    # --- embeddings (unit-norm, 64-dim float32) ---
    v = rng.standard_normal((n_emb, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_emb), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(v.ravel(), pa.float32()), 64
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
        }
    )
    write(out, "embeddings", emb_tbl)

    # --- events (ts sorted by event_id over 30 days) ---
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    ts = t0 + np.sort(rng.integers(0, span_us, n_events)).astype("timedelta64[us]")
    ev_tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
            "event_type": pa.array(rng.choice(EVENT_TYPES, n_events)),
            "value": pa.array(np.round(rng.exponential(50.0, n_events), 2)),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)]
            ),
        }
    )
    write(out, "events", ev_tbl)

    # --- TPC-H-ish star schema ---
    write(
        out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
    )
    write(
        out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
            }
        ),
    )
    write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": pa.array(np.round(rng.uniform(0, 10000, n_cust), 2)),
                "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
            }
        ),
    )
    write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": pa.array(np.round(rng.uniform(0, 10000, n_supp), 2)),
            }
        ),
    )
    pk = np.arange(n_part)
    write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(pk, pa.int64()),
                "p_name": pa.array(
                    [f"{ADJ[i % 10]} {NOUN[(i // 10) % 10]}" for i in range(n_part)]
                ),
                "p_brand": pa.array([f"Brand#{1 + i % 25}" for i in range(n_part)]),
                "p_type": pa.array(
                    rng.choice(["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"], n_part)
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": pa.array(np.round(900.0 + (pk % 2000) * 0.1, 2)),
            }
        ),
    )
    o_date = np.datetime64("1995-01-01") + rng.integers(0, 2404, n_orders).astype(
        "timedelta64[D]"
    )
    write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
                "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_orders)),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000, 500000, n_orders), 2)
                ),
                "o_orderdate": pa.array(o_date.astype("datetime64[us]")),
                "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_orders)),
            }
        ),
    )
    l_date = np.datetime64("1995-01-02") + rng.integers(0, 2499, n_line).astype(
        "timedelta64[D]"
    )
    write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_orders, n_line), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_line), pa.int32()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_line).astype(np.float64)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(1000, 100000, n_line), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_line) * 0.01, 2)
                ),
                "l_tax": pa.array(np.round(rng.integers(0, 9, n_line) * 0.01, 2)),
                "l_returnflag": pa.array(rng.choice(["N", "A", "R"], n_line)),
                "l_linestatus": pa.array(rng.choice(["O", "F"], n_line)),
                "l_shipdate": pa.array(l_date.astype("datetime64[us]")),
            }
        ),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
