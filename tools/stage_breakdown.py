"""Per-stage scaling breakdown of the dedup pipeline.

Times each pipeline stage separately (forced with a count/noop action) at
two parallelism levels so the scaling table can say WHICH stage stops
scaling — the serial-fraction evidence VERDICT r1 asked for.  Stages:

  assemble    groupBy(conv_id) + sort_array(collect_list)      [shuffle]
  sign        normalize/shingle/MinHash Arrow UDFs             [CPU/membw]
  exact       content-sha rep map + join                       [shuffle]
  candidates  band explode + bucket join                       [shuffle]
  verify      shingle joins + array_intersect                  [shuffle+CPU]
  cluster     connected components                             [iterative]

Writes data/stage_breakdown.json; bench.py folds it into BENCH.md.

Usage: python tools/stage_breakdown.py [lo] [hi] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/data/stage_breakdown.json"


def _run_stages(cores: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    from bibexpy_spark import pipeline
    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.functions import udfs
    from bibexpy_spark.operators import assembly, components, exact, lsh
    from bibexpy_spark.operators import verify as verify_op
    from bibexpy_spark.session import build_spark

    spark = build_spark(
        app_name=f"stage_breakdown_{cores}", cores=cores, shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    turns = spark.read.parquet("/root/repo/data/transcripts_bench.parquet")
    turns.count()
    out: dict[str, float] = {}

    def timed(name: str, build):
        t0 = time.time()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
        return df

    conv = timed("assemble", lambda: assembly.assemble_docs(turns))
    conv = conv.persist(); conv.count()
    signed = timed(
        "sign",
        lambda: udfs.with_signature_columns(conv, CANONICAL).drop("doc")
    )
    signed = signed.withColumn("nid", pipeline.surrogate_id(F.col("conv_id")))
    signed = signed.persist(); signed.count()
    grouped = exact.exact_groups(signed).persist()
    timed("exact", lambda: grouped)
    reps = exact.representatives(grouped)
    cand = timed("candidates", lambda: lsh.candidate_pairs(reps, CANONICAL, id_col="nid")[0])
    cand = cand.persist(); cand.count()
    verified = timed(
        "verify", lambda: verify_op.verify_pairs(cand, reps, CANONICAL, id_col="nid")
    )
    dup = verified.filter(F.col("is_dup")).select("a_id", "b_id")
    t0 = time.time()
    components.connected_components(dup, signed.select("nid"), CANONICAL, id_col="nid") \
        .write.format("noop").mode("overwrite").save()
    out["cluster"] = round(time.time() - t0, 2)
    spark.stop()
    time.sleep(0.5)
    return out


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    runs: dict[int, list[dict[str, float]]] = {lo: [], hi: []}
    for _ in range(repeats):
        for c in (lo, hi):  # interleaved
            runs[c].append(_run_stages(c))
    best = {
        c: {k: min(r[k] for r in rs) for k in rs[0]} for c, rs in runs.items()
    }
    result = {
        "levels": {str(c): best[c] for c in best},
        "all_runs": {str(c): runs[c] for c in runs},
        "speedup_per_stage": {
            k: round(best[lo][k] / best[hi][k], 2) if best[hi][k] > 0 else None
            for k in best[lo]
        },
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
