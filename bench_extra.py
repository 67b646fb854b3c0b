"""Round-6 optimization harness: noop-sink isolation per query (guide §1.4).

Times individual registry queries with the same methodology as bench.py
(warm with limit(1).collect(), then time a noop-sink write), optionally
repeating and dumping .explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--repeat N] [--explain TAG] name [name ...]
  python bench_extra.py --sf /root/testdata/sf1.0 --repeat 2 semdedup_keep

Prints one JSON line: {"sf": ..., "queries": {name: min_sec}, "samples": {...}}

bench.py is FROZEN for driver measurement; this file carries the round-6
isolation numbers cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    repeat = 2
    explain_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain_tag = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    from obp_search_engine_spark.session import get_spark
    from obp_search_engine_spark.plans.testdata_queries import REGISTRY
    from obp_search_engine_spark.plans import api_queries  # noqa: F401
    from obp_search_engine_spark.plans import pipeline_queries  # noqa: F401

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/spark-warehouse",
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/derby",
        },
    )

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = REGISTRY[name].fn
        if explain_tag:
            plan_dir = REPO / "plans" / "r06"
            plan_dir.mkdir(parents=True, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{explain_tag}.txt").write_text(txt)
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        fn(spark, sf_dir).limit(1).collect()  # warm (plan + scan caches)
        ts = []
        for _ in range(repeat):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = min(ts)
        samples[name] = ts
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "queries": out, "samples": samples}))


if __name__ == "__main__":
    main()
