"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship canonical dedup pipeline on the sf0.001
transcript fixture; ``queries``/``oracle_sql`` expose the operator registry
(bibexpy_spark.entry_queries) — one entry per implemented operator family
from SURVEY.md §2 plus the training-data ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_fixtures() -> None:
    """Materialize the deterministic transcript fixtures the queries and
    oracle SQL read (BASELINE.json: transcripts are synthesized, not shipped)."""
    from bibexpy_spark import corpus, golden

    for sf in ("sf0.001", "sf0.01"):
        corpus.corpus_path_for_sf(f"/root/testdata/{sf}")
    # golden-parquet oracles for the non-SQL-expressible queries (independent
    # pandas/numpy recomputation; DuckDB reads them via read_parquet)
    golden.ensure_goldens()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: canonical near-dup pipeline (MinHash/LSH + Jaccard verify +
    connected components) on sf0.001 transcripts -> cluster assignments."""
    from bibexpy_spark import corpus, pipeline

    _ensure_fixtures()
    turns = spark.read.parquet(corpus.corpus_path_for_sf("/root/testdata/sf0.001"))
    res = pipeline.run_dedup(
        spark, turns, with_containment=False, with_simhash_pass=False
    )
    return res["clusters"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bibexpy_spark import entry_queries

    _ensure_fixtures()
    return entry_queries.all_queries()


def oracle_sql() -> dict[str, str]:
    from bibexpy_spark import entry_queries

    _ensure_fixtures()
    return entry_queries.all_oracles()
