"""Benchmark harness.

Runs (1) the flagship canonical dedup pipeline at TWO parallelism levels
(local[8] vs local[32] — the sandbox proxy for N vs 4N executors demanded by
the north rule) reporting turns/sec and scaling efficiency, and (2) the
headline operator queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line at the end; also refreshes BENCH.md with the scaling
table.  Set SPARK_GRAFT_BENCH_FAST=1 to skip the local[8] leg (dev loop).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FAST = os.environ.get("SPARK_GRAFT_BENCH_FAST", "") == "1"

#: headline operator queries (subset of the driver-contract registry)
HEADLINE = [
    "t_assemble",
    "t_exact_dup_groups",
    "t_gram_dup_pairs",
    "t_clusters",
    "q_sum_decimal",
    "q_blocking_join",
    "q_topk_per_group",
    "d_ngram_jaccard_pairs",
    "d_langid",
    "e_knn_bruteforce",
]


def _force(df) -> int:
    """Fully materialize a DataFrame without driver-side collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_pipeline(cores: int, turns_path: str, repeats: int = 2) -> dict:
    """One scaling leg: full pipeline wall time at a parallelism level.

    Best-of-``repeats``: this sandbox shows intermittent host-level CPU
    throttling (2-50x swings on identical numpy ops), so the minimum wall
    time is the capability estimate; all runs are reported.
    """
    from bibexpy_spark import pipeline
    from bibexpy_spark.session import build_spark

    walls = []
    n_turns = n_clusters = 0
    for _ in range(repeats):
        spark = build_spark(
            app_name=f"bench_dedup_{cores}", cores=cores, shuffle_partitions=cores
        )
        turns = spark.read.parquet(turns_path)
        n_turns = turns.count()
        t0 = time.time()
        res = pipeline.run_dedup(
            spark, turns, with_containment=False, with_simhash_pass=False
        )
        n_clusters = res["clusters"].select("cluster_id").distinct().count()
        walls.append(time.time() - t0)
        spark.stop()
    wall = min(walls)
    return {
        "cores": cores,
        "n_turns": n_turns,
        "wall_s": round(wall, 2),
        "all_runs_s": [round(w, 2) for w in walls],
        "turns_per_sec": round(n_turns / wall, 1),
        "n_clusters": n_clusters,
    }


def main() -> None:
    from bibexpy_spark import corpus
    from bibexpy_spark.session import build_spark

    sf = os.path.basename(SF_DIR.rstrip("/"))
    corpus.corpus_path_for_sf(SF_DIR)

    # --- scaling: same job, same input, two parallelism levels -------------
    # dedicated larger corpus (120k conversations, ~1.1M turns): at the
    # driver-fixture sizes the pipeline is scheduling-latency-bound and no
    # parallelism level can show its throughput
    bench_corpus = corpus.write_parquet(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "transcripts_bench.parquet"),
        120_000, seed=43,
    )
    legs = [CPUS] if FAST else [8, CPUS]
    scaling = {c: bench_pipeline(c, bench_corpus, repeats=1 if FAST else 2)
               for c in legs}
    lo, hi = min(scaling), max(scaling)
    eff = None
    if lo != hi:
        speedup = scaling[hi]["turns_per_sec"] / scaling[lo]["turns_per_sec"]
        eff = round(speedup / (hi / lo), 3)

    # --- headline queries ---------------------------------------------------
    import __spark_entry__ as entrymod

    spark = build_spark(app_name="bench_queries", cores=CPUS, shuffle_partitions=CPUS)
    qs = entrymod.queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _force(qs[name](spark, SF_DIR))
        per_query[name] = round(time.time() - t0, 2)
    spark.stop()

    total = round(sum(per_query.values()), 2)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf.replace("sf", "")) if sf.startswith("sf") else sf,
        "pipeline": {f"local[{c}]": scaling[c] for c in scaling},
        "throughput_turns_per_sec": scaling[hi]["turns_per_sec"],
        "scaling_efficiency": eff,
    }

    _write_bench_md(result, lo, hi, scaling, eff)
    print(json.dumps(result))


def _write_bench_md(result, lo, hi, scaling, eff) -> None:
    lines = [
        "# BENCH — measured results",
        "",
        f"Corpus: deterministic synthetic transcripts at {result['sf']} "
        f"({scaling[hi]['n_turns']} turns), `bibexpy_spark.corpus` seed 42.",
        "",
        "## Scaling (north rule: same job, N vs 4N parallelism)",
        "",
        "| leg | wall (s) | turns/sec |",
        "|---|---|---|",
    ]
    for c in sorted(scaling):
        s = scaling[c]
        lines.append(f"| local[{c}] | {s['wall_s']} | {s['turns_per_sec']} |")
    if eff is not None:
        lines.append("")
        lines.append(
            f"Scaling efficiency local[{lo}] → local[{hi}]: **{eff}** "
            f"(target ≥ 0.8 per BASELINE.json; sandbox proxy for N → 4N executors)."
        )
    lines += [
        "",
        "## Headline queries (sf0.1, local[32], fully materialized)",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for k, v in result["queries"].items():
        lines.append(f"| {k} | {v} |")
    lines.append("")
    lines.append(f"Total: {result['value']} s")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
