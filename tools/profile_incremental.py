"""Stage-level wall breakdown of one incremental leg at bench scale.

Times each materialization boundary of ``run_incremental_dedup`` separately
(the call itself — which eagerly runs signing, the band join, verify and the
connected-components loop via CC's internal localCheckpoint — then the
clusters action, then stats), plus the full-batch leg for the same corpus,
so optimization work targets the measured hot stage instead of a guess.

Run:  python tools/profile_incremental.py [cores]   (~5-10 min)
Prints one JSON line per timed span.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIG_COLS = ["conv_id", "content_sha", "shingles", "band_hashes"]


def span(name, fn):
    t0 = time.time()
    out = fn()
    print(json.dumps({"span": name, "s": round(time.time() - t0, 2)}), flush=True)
    return out


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import functions as F

    from bibexpy_spark import corpus, pipeline
    from bibexpy_spark.incremental import run_incremental_dedup
    from bibexpy_spark.session import build_spark

    path = corpus.write_parquet(
        os.path.join(REPO, "data", "transcripts_bench.parquet"), 120_000, seed=43
    )
    scratch = os.path.join(REPO, "data", "scratch_incr_prof")
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)

    spark = build_spark(
        app_name="profile_incremental", cores=cores, shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    turns = spark.read.parquet(path)

    bucket = F.abs(F.xxhash64("conv_id")) % 1000
    prior_turns = turns.filter(~(bucket < 10))
    delta_turns = turns.filter(bucket < 10)

    prior = span(
        "prior_state_build",
        lambda: pipeline.run_dedup(
            spark, prior_turns, with_containment=False, with_simhash_pass=False
        ),
    )
    signed_p = os.path.join(scratch, "prior_signed.parquet")
    clusters_p = os.path.join(scratch, "prior_clusters.parquet")
    span(
        "prior_state_write",
        lambda: (
            prior["signed"].select(*SIG_COLS).write.parquet(signed_p),
            prior["clusters"].write.parquet(clusters_p),
        ),
    )

    for i in range(2):
        ps = spark.read.parquet(signed_p)
        pc = spark.read.parquet(clusters_p)
        res = span(
            f"incr_call_{i}",  # signing + band join + verify + CC (eager)
            lambda: run_incremental_dedup(spark, delta_turns, ps, pc),
        )
        span(
            f"incr_clusters_count_{i}",
            lambda: res["clusters"].select("cluster_id").distinct().count(),
        )
        span(f"incr_stats_{i}", lambda: res["stats"].collect())
        res["cleanup"]()

        span(
            f"full_batch_{i}",
            lambda: pipeline.run_dedup(
                spark, turns, with_containment=False, with_simhash_pass=False
            )["clusters"].select("cluster_id").distinct().count(),
        )

    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
