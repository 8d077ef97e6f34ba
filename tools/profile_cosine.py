"""A/B the cosine backends (Arrow einsum kernel vs JVM HigherOrderFunction)
on the dense pair query (e_cosine_dup_pairs shape) — measured, not guessed.

Usage: python tools/profile_cosine.py [sf_dir] [cores] [repeats]
Prints per-backend walls (cold-first order interleaved) and the row counts,
which must be identical.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bibexpy_spark.functions import vector_ops  # noqa: E402
from bibexpy_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = build_spark(app_name="profile_cosine", cores=cores,
                        shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = e.count()
    print(f"vectors: {n} ({sf_dir})")

    a = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"))

    def run(backend: str) -> tuple[float, int]:
        j = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
        j = j.withColumn(
            "cos",
            F.round(vector_ops.cosine(F.col("a_emb"), F.col("b_emb"), backend), 4),
        ).filter(F.col("cos") >= 0.4)
        t0 = time.monotonic()
        cnt = j.count()
        return time.monotonic() - t0, cnt

    walls: dict[str, list[float]] = {"kernel": [], "hof": []}
    counts = set()
    for r in range(repeats):
        for backend in ("kernel", "hof"):
            w, cnt = run(backend)
            walls[backend].append(round(w, 2))
            counts.add(cnt)
            print(f"round {r} {backend:6s}: {w:7.2f}s  rows={cnt}")
    assert len(counts) == 1, f"backends disagree: {counts}"
    for backend, ws in walls.items():
        print(f"{backend:6s} min {min(ws):7.2f}s  all {ws}")
    spark.stop()


if __name__ == "__main__":
    main()
