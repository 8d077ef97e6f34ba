"""External-API enrichment pattern: bounded-concurrency fetch inside
``mapInPandas`` (SURVEY.md §2.1 "External API source").

Reference parity (packages/bibex_core/modules/api_utils.py:19-46
``_get_with_retry`` + apps/api/services/enricher.py:86-175): per-DOI fetch
with retry/backoff, filling empty fields from the response.

The network layer is injected (``fetcher``): production passes an HTTP
client; tests (and this offline sandbox) pass a deterministic fake.  Each
Arrow batch fans its rows over a small thread pool — the executor-side
analogue of the reference's bounded CPU pool — so total in-flight requests =
executors x pool size, an explicit, tunable number.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def fetch_with_retry(
    fetcher: Callable[[str], dict | None],
    key: str,
    retries: int = 3,
    backoff_s: float = 0.2,
) -> dict | None:
    """Retry/backoff wrapper (parity api_utils.py:19-46)."""
    last_exc: Exception | None = None
    for attempt in range(retries):
        try:
            return fetcher(key)
        except Exception as exc:  # noqa: BLE001 — any transport error retries
            last_exc = exc
            time.sleep(backoff_s * (2**attempt))
    if last_exc is not None:
        return None
    return None


ENRICHED_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("filled_abstract", T.StringType()),
        T.StructField("filled_oa", T.StringType()),
        T.StructField("hit", T.BooleanType()),
    ]
)


def enrich_by_doi(
    records: DataFrame,
    fetcher: Callable[[str], dict | None],
    id_col: str = "record_id",
    doi_col: str = "doi",
    pool_size: int = 4,
) -> DataFrame:
    """records -> enrichment rows via mapInPandas with a per-batch pool."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=pool_size) as pool:
            for pdf in it:
                dois = pdf[doi_col].fillna("")
                results = list(
                    pool.map(
                        lambda d: fetch_with_retry(fetcher, d) if d else None, dois
                    )
                )
                yield pd.DataFrame(
                    {
                        "record_id": pdf[id_col].astype(str),
                        "doi": dois,
                        "filled_abstract": [
                            (r or {}).get("abstract") for r in results
                        ],
                        "filled_oa": [(r or {}).get("oa_status") for r in results],
                        "hit": [r is not None for r in results],
                    }
                )

    return records.mapInPandas(batches, schema=ENRICHED_SCHEMA)


def fake_fetcher(doi: str) -> dict | None:
    """Deterministic offline stand-in for Crossref/OpenAlex/Unpaywall."""
    if not doi or not doi.startswith("10."):
        return None
    return {
        "abstract": f"Abstract for {doi}",
        "oa_status": "gold" if doi.endswith(("0", "2", "4", "6", "8")) else "closed",
    }
