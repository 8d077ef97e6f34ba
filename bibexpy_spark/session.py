"""SparkSession factory tuned for the sandbox (local[N]) while keeping the
settings that matter on a real multi-executor cluster (AQE, skew join,
Arrow batching, sane shuffle partitions)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "bibexpy_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # shuffle.partitions is already sized to the core count; AQE
        # coalescing below that only strangles CPU-bound UDF stages
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound the per-batch python-worker footprint: at the default 10k
        # records/batch, multi-KB transcript docs times the shingle-set
        # expansion inside the kernels peak at several hundred MB per
        # worker — the prime suspect for the r4 submit-leg failure class
        # (10 "Python worker exited unexpectedly" at local[8] on the 4.5M-
        # turn corpus; VERDICT r4 #3).  4096 halves the peak at no
        # measurable vectorization loss (numpy kernels saturate well below
        # 4k rows/batch)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark: SparkSession, cores: int) -> None:
    """Prime the Python worker pool (fork + numpy/pandas/pyarrow import +
    kernel JIT paths) before a timed region — session-fixed cost, not
    pipeline cost; on a real cluster each executor pays it once per
    session.  Uses the REAL signature UDFs over one tiny row per core, so
    exactly the worker state the pipeline needs is warm.  (Shared by
    bench.py legs and jobs/dedup_job.py --bench-json.)"""
    from pyspark.sql import functions as F

    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.functions import udfs

    tiny = spark.range(0, cores * 4, 1, cores).select(
        F.concat(F.lit("warm sample text "), F.col("id").cast("string")).alias("doc")
    )
    udfs.with_signature_columns(tiny, CANONICAL).select(
        F.sum(F.size("band_hashes"))
    ).collect()
