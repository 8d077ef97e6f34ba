"""Profile the t_gram_dup_pairs plan at a given SF: candidate volume after
each lossless prune (prefix / +length / +positional) and end-to-end wall,
so plan changes are measured rather than guessed.

Usage: python tools/profile_gram_pairs.py [sf_dir] [cores]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from bibexpy_spark.entry_queries import transcripts  # noqa: E402
from bibexpy_spark.operators import ngram  # noqa: E402
from bibexpy_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k, t_num, t_den = transcripts.K, 4, 5

    spark = build_spark(app_name="profile_gram", cores=cores,
                        shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    conv = transcripts.conv_df(spark, sf_dir).persist()
    n_docs = conv.count()

    g = ngram.with_grams(conv, "conv_id", "doc", k)
    hashed = g.select(
        "id",
        F.array_sort(
            F.array_distinct(F.transform("grams", lambda s: F.xxhash64(s)))
        ).alias("gh"),
    ).persist()
    ex = hashed.select("id", F.size("gh").alias("n_g"), F.explode("gh").alias("h"))
    freq = ex.groupBy("h").agg(F.count("*").alias("df"))
    with_df = ex.join(freq, "h")
    ceil_t = F.floor((F.col("n_g") * t_num + t_den - 1) / t_den)
    rk = F.row_number().over(W.partitionBy("id").orderBy("df", "h"))
    prefix = (
        with_df.withColumn("_rk", rk)
        .filter(F.col("_rk") <= F.col("n_g") - ceil_t + 1)
        .select("id", "n_g", "_rk", "h")
    ).persist()
    n_prefix_rows = prefix.count()

    nx, ny = F.col("x.n_g"), F.col("y.n_g")
    i, j = F.col("x._rk"), F.col("y._rk")
    joined = (
        prefix.alias("x").join(prefix.alias("y"), "h")
        .filter(F.col("x.id") < F.col("y.id"))
    )
    raw_pairs = joined.select("x.id", "y.id").distinct().count()
    len_ok = joined.filter(
        F.least(nx, ny) * t_den >= F.greatest(nx, ny) * t_num
    )
    len_pairs = len_ok.select("x.id", "y.id").distinct().count()
    pos = (
        len_ok.select(
            F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"),
            (F.least(i - 1, j - 1) + 1 + F.least(nx - i, ny - j)).alias("_ub"),
            (nx + ny).alias("_sz"),
        )
        .groupBy("a_id", "b_id")
        .agg(F.min("_ub").alias("_ub"), F.min("_sz").alias("_sz"))
        .filter(F.col("_ub") * (t_den + t_num) >= F.col("_sz") * t_num)
    )
    pos_pairs = pos.count()

    print(f"docs={n_docs} prefix_rows={n_prefix_rows}")
    print(f"candidates: prefix-only={raw_pairs} +length={len_pairs} "
          f"+positional={pos_pairs}")

    # end-to-end wall of the production operator (includes verify)
    t0 = time.time()
    out = ngram.gram_jaccard_pairs(conv, "conv_id", "doc", k, t_num, t_den)
    n_final = out.count()
    wall = time.time() - t0
    print(f"final_pairs={n_final} wall_s={wall:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
