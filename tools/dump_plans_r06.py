"""Dump .explain("formatted") for named registry queries to
plans/r06/<name>_<tag>.txt — the round-6 before/after plan evidence.

Usage: python tools/dump_plans_r06.py TAG name [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from obp_search_engine_spark.plans import api_queries  # noqa: F401
    from obp_search_engine_spark.plans import pipeline_queries  # noqa: F401
    from obp_search_engine_spark.plans.testdata_queries import REGISTRY
    from obp_search_engine_spark.session import get_spark

    spark = get_spark("plans-r06", master="local[4]", shuffle_partitions=8)
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    sf = "/root/testdata/sf0.001"
    for name in names:
        df = REGISTRY[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan.strip() + "\n")
        print(f"wrote plans/r06/{name}_{tag}.txt")


if __name__ == "__main__":
    main()
