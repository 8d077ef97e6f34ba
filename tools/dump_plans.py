"""Dump .explain('formatted') for headline queries to plans/r06/<q>_<tag>.txt.

Usage: python tools/dump_plans.py before|after [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    only = sys.argv[2:]

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from bibexpy_spark.session import build_spark

    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark(app_name=f"plans_{tag}", cores=8,
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in (only or HEADLINE):
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
