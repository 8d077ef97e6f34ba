"""Round-6 optimization profiling harness (bench.py is FROZEN for
measurement; every extra measurement lives here).

Modes:

  stages   per-stage decomposition of the gram-pair plan (the two headline
           entries t_gram_dup_pairs / d_ngram_jaccard_pairs are 61% of the
           headline total) under the SAME protocol the frozen bench times:
           the with_gram_hashes frame is persisted+materialized first (the
           warm pass leaves it cached), then each downstream stage is
           materialized through the noop sink (guide §1.4) with a job
           description label (guide §1.5).

  headline one warm+timed headline pass in-process (the frozen
           run_headline_round protocol) printing per-query seconds — the
           dev loop for before/after numbers without the subprocess relaunch.

Usage: python bench_extra.py stages|headline [sf_dir] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _noop(df, label, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:46s} {dt:7.2f}s", flush=True)
    return dt


def profile_gram_stages(spark, df, id_col, text_col, k, t_num, t_den, tag):
    from pyspark.sql import Window as W

    from bibexpy_spark.operators import ngram

    print(f"[{tag}] k={k} t={t_num}/{t_den}", flush=True)
    hashed = ngram.with_gram_hashes(df, id_col, text_col, k).persist()
    t0 = time.time()
    n = hashed.count()
    print(f"  {'gram-hash UDF (materialize cache)':46s} {time.time()-t0:7.2f}s"
          f"  rows={n}", flush=True)

    ex = hashed.select("id", F.size("gh").alias("n_g"), F.explode("gh").alias("h"))
    _noop(ex, f"{tag}: explode only", spark)
    freq = ex.groupBy("h").agg(F.count("*").alias("df"))
    _noop(freq, f"{tag}: freq agg", spark)
    with_df = ex.join(freq, "h")
    _noop(with_df, f"{tag}: freq agg + join back", spark)
    ceil_t = F.floor((F.col("n_g") * t_num + t_den - 1) / t_den)
    rk = F.row_number().over(W.partitionBy("id").orderBy("df", "h"))
    prefix = (
        with_df.withColumn("_rk", rk)
        .filter(F.col("_rk") <= F.col("n_g") - ceil_t + 1)
        .filter(F.col("df") >= 2)
        .select("id", "n_g", "_rk", "h")
    )
    _noop(prefix, f"{tag}: + window prefix", spark)
    nx, ny = F.col("x.n_g"), F.col("y.n_g")
    i, j = F.col("x._rk"), F.col("y._rk")
    matched = (
        prefix.alias("x")
        .join(prefix.alias("y"), "h")
        .filter(F.col("x.id") < F.col("y.id"))
        .filter(F.least(nx, ny) * t_den >= F.greatest(nx, ny) * t_num)
        .select(
            F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"),
            (F.least(i - 1, j - 1) + 1 + F.least(nx - i, ny - j)).alias("_ub"),
            (nx + ny).alias("_sz"),
        )
    )
    cand = (
        matched.groupBy("a_id", "b_id")
        .agg(F.min("_ub").alias("_ub"), F.min("_sz").alias("_sz"))
        .filter(F.col("_ub") * (t_den + t_num) >= F.col("_sz") * t_num)
        .select("a_id", "b_id")
    )
    _noop(cand, f"{tag}: + candidate self-join", spark)
    out = ngram.verify_gram_pairs(cand, hashed, t_num, t_den)
    _noop(out, f"{tag}: + verify (full phase1+2)", spark)
    full = ngram.gram_jaccard_pairs(df, id_col, text_col, k, t_num, t_den)
    _noop(full, f"{tag}: gram_jaccard_pairs as shipped", spark)
    hashed.unpersist()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    from bibexpy_spark.session import build_spark, warm_python_workers

    spark = build_spark(
        app_name=f"bench_extra_{mode}", cores=cores, shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cores)

    if mode == "stages":
        from bibexpy_spark.entry_queries import transcripts

        conv = transcripts.conv_df(spark, sf_dir)
        profile_gram_stages(
            spark, conv, "conv_id", "doc", transcripts.K, 4, 5, "t_gram"
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        profile_gram_stages(
            spark, docs, "doc_id", "text", 3, 1, 2, "d_ngram"
        )
    elif mode == "headline":
        import __spark_entry__ as entrymod
        from bench import HEADLINE, _force
        from bibexpy_spark.entry_queries import transcripts

        spark.range(0, 100_000, 1, cores).groupBy(
            (F.col("id") % 97).alias("k")
        ).count().write.format("noop").mode("overwrite").save()
        qs = entrymod.queries()
        for name in HEADLINE:
            _force(qs[name](spark, sf_dir))
        for df in transcripts._GRAM_CACHE.values():
            df.unpersist()
        transcripts._GRAM_CACHE.clear()
        out = {}
        for name in HEADLINE:
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            out[name] = round(time.time() - t0, 2)
        print(json.dumps({"total": round(sum(out.values()), 2), "queries": out}))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()


if __name__ == "__main__":
    main()
