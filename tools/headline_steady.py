"""Steady-state vs cold-plan A/B for the r4 headline regressions.

VERDICT r4 #6: ``t_assemble`` minima moved 0.68 (r3) -> 1.93 (r4) and
``t_exact_dup_groups`` 0.89 -> 1.46 at identical sf/config, surviving the
r5 clean-phase session — so NOT host phase.  Suspect: the r4 bench
protocol change, not the plan.  r3 timed repeated rounds INSIDE one
session (later rounds run with hot JIT, hot parquet footers, hot page
cache); r4 runs every round as its own cold-JVM subprocess whose single
warmup job (Arrow UDF signing + one tiny shuffle) does not warm the
first query's whole-stage-codegen compile or the corpus scan path —
and t_assemble is literally the FIRST query of the round, with
t_exact_dup_groups (same conv_df subtree) second.

This tool measures both queries N times within ONE warmed session.  If
the steady-state times return to ~r3 levels, the regression is cold-plan
protocol cost (per-session fixed, amortized to zero at 100 TB), not a
plan regression from the r4 codegen-native assembly projection.

Usage: python tools/headline_steady.py [repeats]   -> one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import __spark_entry__ as entrymod

    from bench import _force, _warm_python_workers
    from bibexpy_spark.session import build_spark

    spark = build_spark(
        app_name="headline_steady", cores=CPUS, shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    _warm_python_workers(spark, CPUS)
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in ("t_assemble", "t_exact_dup_groups"):
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            _force(qs[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 2))
        out[name] = runs
    spark.stop()
    print(json.dumps({
        "sf_dir": SF_DIR,
        "cores": CPUS,
        "runs": out,
        "first": {k: v[0] for k, v in out.items()},
        "steady_min": {k: min(v[1:]) for k, v in out.items()},
    }))


if __name__ == "__main__":
    main()
