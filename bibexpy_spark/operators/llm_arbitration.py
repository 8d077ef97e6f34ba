"""LLM arbitration tier for disambiguation (reference parity).

Reference (apps/api/services/disambiguation/pipeline.py:396-410): Tier-2
blocks with no ORCID signal go to an LLM with a CONTENT-HASH response cache —
identical block content never pays for a second call; blocks stay
manual-review when no arbiter is configured.

Spark-first restatement:

  payload      per cluster, a deterministic JSON document over the sorted
               variant list (native exprs: to_json over the array_sort'ed
               variants — no UDF)
  cache key    sha256 of the payload string, computed JVM-side
  cache        a (cache_key, response) DataFrame (parquet/Iceberg-backed in
               production); hits resolve by broadcast left join
  misses       ONLY cache misses reach the arbiter, through the same
               bounded-concurrency mapInPandas + retry/backoff pattern as
               sources/enrichment.py (the network layer is injected — tests
               and this offline sandbox pass a deterministic fake; no
               arbiter means every unknown stays 'manual_review', exactly
               the reference's no-LLM branch)

The arbiter callable receives the payload JSON string and returns a dict
(e.g. {"verdict": "merge"|"split", ...}); its JSON-serialized response is
what the cache stores, so a replayed run is bit-identical.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bibexpy_spark.sources.enrichment import fetch_with_retry

CACHE_SCHEMA = T.StructType(
    [
        T.StructField("cache_key", T.StringType()),
        T.StructField("response", T.StringType()),
    ]
)

_MISS_SCHEMA = T.StructType(
    [
        T.StructField("cache_key", T.StringType()),
        T.StructField("response", T.StringType()),
    ]
)


def with_payload(proposals: DataFrame) -> DataFrame:
    """Attach the deterministic arbitration payload + content-hash key.

    The payload is a canonical JSON document over the cluster's sorted
    variants (the reference hashes its LLM request payload the same way,
    cache.hash_key(payload), pipeline.py:399)."""
    payload = F.concat(
        F.lit('{"task":"author_disambiguation","variants":'),
        F.to_json(F.array_sort("variants")),
        F.lit("}"),
    )
    return proposals.withColumn("payload", payload).withColumn(
        "cache_key", F.sha2(F.col("payload"), 256)
    )


def arbitrate_tier2_unknown(
    proposals: DataFrame,
    arbiter: Callable[[str], dict | None] | None,
    cache: DataFrame | None = None,
    pool_size: int = 4,
) -> dict[str, DataFrame]:
    """Route Tier-2 ORCID-unknown proposals through the cached arbiter.

    Returns
      arbitrated  proposals + (payload, cache_key, llm_verdict, llm_source)
                  — llm_source in {'cache', 'llm', 'manual_review'};
                  non-Tier-2-unknown rows pass through with nulls
      cache       the grown cache table (old ∪ newly fetched responses)
    """
    spark = proposals.sparkSession
    if cache is None:
        cache = spark.createDataFrame([], CACHE_SCHEMA)

    needs = F.col("tier") == 2
    if "orcid_verdict" in proposals.columns:
        needs = needs & (F.coalesce("orcid_verdict", F.lit("unknown")) == "unknown")
    keyed = with_payload(proposals).withColumn("_needs_llm", needs)

    # the cache is unbounded production state (months of responses) — never
    # broadcast it (r4 review).  The inner join broadcasts the delta-sized
    # `pending` side instead; the anti join must keep pending on the left,
    # so it gets a narrowed cache and AQE picks the strategy.
    pending = keyed.filter("_needs_llm").select("cache_key", "payload").distinct()
    hits = cache.join(F.broadcast(pending.select("cache_key")), "cache_key", "inner")
    misses = pending.join(cache.select("cache_key"), "cache_key", "left_anti")

    if arbiter is not None:
        def _call(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                for pdf in it:
                    resps = list(
                        pool.map(lambda p: fetch_with_retry(arbiter, p), pdf["payload"])
                    )
                    yield pd.DataFrame(
                        {
                            "cache_key": pdf["cache_key"],
                            "response": [
                                json.dumps(r, sort_keys=True) if r is not None else None
                                for r in resps
                            ],
                        }
                    )

        # persist: `fetched` feeds BOTH the grown cache and the verdicts —
        # without it each downstream action re-invokes the external arbiter
        # (double cost), and a nondeterministic arbiter could store one
        # response in the cache while showing another in `arbitrated`,
        # breaking replay bit-identity (r4 review).  Miss-sized, released
        # with the session (callers materialize both outputs immediately).
        fetched = (
            misses.mapInPandas(_call, schema=_MISS_SCHEMA)
            .filter(F.col("response").isNotNull())
            .persist()
        )
    else:
        fetched = spark.createDataFrame([], CACHE_SCHEMA)

    new_cache = cache.unionByName(fetched).dropDuplicates(["cache_key"])

    resolved = (
        hits.select("cache_key", "response", F.lit("cache").alias("llm_source"))
        .unionByName(
            fetched.select("cache_key", "response", F.lit("llm").alias("llm_source"))
        )
    )
    arbitrated = (
        keyed.join(F.broadcast(resolved), "cache_key", "left")
        .withColumn(
            "llm_verdict",
            F.when(
                F.col("_needs_llm"),
                F.coalesce(
                    F.get_json_object("response", "$.verdict"),
                    F.lit("manual_review"),
                ),
            ),
        )
        .withColumn(
            "llm_source",
            F.when(
                F.col("_needs_llm"),
                F.coalesce("llm_source", F.lit("manual_review")),
            ),
        )
        .drop("_needs_llm", "response")
    )
    return {"arbitrated": arbitrated, "cache": new_cache}
