"""Local replica of the driver's DuckDB-oracle correctness check.

Runs every queries() entry at sf0.01 next to its oracle_sql() in DuckDB,
compares row count, column names (sorted), and values (rows sorted by all
columns) — exact match, like the driver's value hash.

Usage: python tools/check_oracle.py [name ...] [--sf DIR] [--json OUT]

--json OUT additionally writes a machine-readable sweep artifact
{name: {status, rows, secs, detail?}} — the committed SWEEP_r0N.json
evidence that every registry entry (graded window AND tail) is exact.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(v):
    """Canonical comparable form: dict/Row -> sorted-key dict, arrays ->
    tuples, so struct-typed results from Spark and DuckDB compare equal."""
    if isinstance(v, dict):
        return {k: _canon(x) for k, x in sorted(v.items())}
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "asDict"):  # pyspark Row
        return _canon(v.asDict())
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: _canon(v) if v is not None else None)
    if len(df):
        # sort rows by a total-order repr key (nested dict/tuple values are
        # not directly comparable across mixed None/str)
        key = df.apply(lambda r: repr(tuple(r)), axis=1)
        df = df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)
    return df


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    json_out: str | None = None
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":  # space-separated form — don't eat DIR as a name
            if i + 1 >= len(argv):
                sys.exit("usage: check_oracle.py [name ...] [--sf DIR] [--json OUT]")
            i += 1
            sf_dir = argv[i]
        elif a.startswith("--json="):
            json_out = a.split("=", 1)[1]
        elif a == "--json":
            if i + 1 >= len(argv):
                sys.exit("usage: check_oracle.py [name ...] [--sf DIR] [--json OUT]")
            i += 1
            json_out = argv[i]
        elif not a.startswith("--"):
            args.append(a)
        i += 1

    import __spark_entry__ as e
    from obp_search_engine_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    qs, oracles = e.queries(), e.oracle_sql()
    names = args or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    report: dict[str, dict] = {}
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            report[name] = {"status": "fail", "detail": f"spark: {type(ex).__name__}"}
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only) [{dt:.1f}s]")
            report[name] = {
                "status": "rows_only", "rows": len(sdf), "secs": round(dt, 2),
            }
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb raised {type(ex).__name__}: {ex}")
            report[name] = {"status": "fail", "detail": f"duckdb: {type(ex).__name__}"}
            n_fail += 1
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            report[name] = {"status": "fail", "detail": "column mismatch"}
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            report[name] = {"status": "fail", "detail": f"rows {len(a)} vs {len(b)}"}
            n_fail += 1
            continue
        # dtype-strict gate: the driver hashes the SERIALIZED frames, so an
        # int64-vs-float64 column (e.g. DuckDB HUGEINT fetched as float)
        # fails there even when Python == says the values match. Catch it
        # here so the local sweep is a faithful driver proxy.
        dtype_bad = [
            c
            for c in a.columns
            if (a[c].dtype.kind in "iu") != (b[c].dtype.kind in "iu")
            and {a[c].dtype.kind, b[c].dtype.kind} <= set("iuf")
        ]
        if dtype_bad:
            det = {c: f"{a[c].dtype}!={b[c].dtype}" for c in dtype_bad}
            print(f"FAIL  {name}: int/float dtype mismatch {det}")
            report[name] = {"status": "fail", "detail": f"dtype mismatch {det}"}
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=True, check_datetimelike_compat=True
            )
            print(f"OK    {name}: {len(a)} rows [{dt:.1f}s]")
            report[name] = {"status": "ok", "rows": len(a), "secs": round(dt, 2)}
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL  {name}: value mismatch: {str(ex).splitlines()[-1]}")
            # show first diff
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark :", a.loc[i].to_dict())
                print("  oracle:", b.loc[i].to_dict())
            report[name] = {"status": "fail", "detail": "value mismatch"}
            n_fail += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail")
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "n_entries": len(names),
            "n_ok": n_pass,
            "n_rows_only": n_rowsonly,
            "n_fail": n_fail,
            "entries": report,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=False)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
