"""LLM arbitration tier (reference pipeline.py:396-410): Tier-2
ORCID-unknown blocks -> injected arbiter behind a content-hash cache."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bibexpy_spark.operators import llm_arbitration as llm

_PROPOSAL_SCHEMA = T.StructType(
    [
        T.StructField("cluster_id", T.StringType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("variants", T.ArrayType(T.StringType())),
        T.StructField("orcid_verdict", T.StringType()),
    ]
)


def _proposals(spark):
    rows = [
        ("c1", 2, ["smith j", "smith jo"], "unknown"),      # -> arbiter
        ("c2", 2, ["lee k", "lee ka", "lee kay"], "unknown"),  # -> arbiter
        ("c3", 2, ["smith j", "smith jo"], "unknown"),      # same content as c1
        ("c4", 1, ["gray b", "gray bo"], "unknown"),        # tier 1: skip
        ("c5", 2, ["wang x", "wang xi"], "merge"),          # orcid decided: skip
    ]
    return spark.createDataFrame(rows, _PROPOSAL_SCHEMA)


def _counting_arbiter(marker_dir: str):
    def arbiter(payload: str) -> dict:
        import tempfile

        data = json.loads(payload)
        tempfile.mkstemp(prefix="call_", dir=marker_dir)
        return {"verdict": "merge" if len(data["variants"]) <= 2 else "split"}

    return arbiter


def test_arbitration_cache_and_verdicts(spark, tmp_path):
    marker = tmp_path / "calls"
    marker.mkdir()
    props = _proposals(spark)

    res = llm.arbitrate_tier2_unknown(props, _counting_arbiter(str(marker)))
    out = {r["cluster_id"]: r for r in res["arbitrated"].collect()}

    # tier-2 unknown rows resolved by the arbiter
    assert out["c1"]["llm_verdict"] == "merge" and out["c1"]["llm_source"] == "llm"
    assert out["c2"]["llm_verdict"] == "split" and out["c2"]["llm_source"] == "llm"
    # identical content -> identical cache_key -> one shared response
    assert out["c3"]["cache_key"] == out["c1"]["cache_key"]
    assert out["c3"]["llm_verdict"] == "merge"
    # non-eligible rows pass through untouched
    assert out["c4"]["llm_verdict"] is None and out["c4"]["llm_source"] is None
    assert out["c5"]["llm_verdict"] is None and out["c5"]["llm_source"] is None

    # content-hash dedup: exactly 2 distinct payloads -> exactly 2 calls
    assert len(list(marker.iterdir())) == 2
    cache = res["cache"]
    assert cache.count() == 2

    # second run against the returned cache: the arbiter must never fire —
    # a raising arbiter proves the miss set is empty
    def raiser(payload: str) -> dict:
        raise AssertionError("arbiter called despite full cache")

    res2 = llm.arbitrate_tier2_unknown(props, raiser, cache=cache)
    out2 = {r["cluster_id"]: r for r in res2["arbitrated"].collect()}
    for cid in ("c1", "c2", "c3"):
        assert out2[cid]["llm_source"] == "cache"
        assert out2[cid]["llm_verdict"] == out[cid]["llm_verdict"]
    assert res2["cache"].count() == 2


def test_arbitration_no_arbiter_manual_review(spark):
    """Reference no-LLM branch: unknowns stay queued for manual review."""
    props = _proposals(spark)
    res = llm.arbitrate_tier2_unknown(props, arbiter=None)
    out = {r["cluster_id"]: r for r in res["arbitrated"].collect()}
    for cid in ("c1", "c2", "c3"):
        assert out[cid]["llm_verdict"] == "manual_review"
        assert out[cid]["llm_source"] == "manual_review"
    assert res["cache"].count() == 0


def test_arbitration_payload_deterministic(spark):
    """Payload is canonical over sorted variants: permuted input, same key."""
    a = spark.createDataFrame([("x", 2, ["b", "a"], "unknown")], _PROPOSAL_SCHEMA)
    b = spark.createDataFrame([("y", 2, ["a", "b"], "unknown")], _PROPOSAL_SCHEMA)
    ka = llm.with_payload(a).select("cache_key").first()[0]
    kb = llm.with_payload(b).select("cache_key").first()[0]
    assert ka == kb


def test_arbitration_wired_into_disambiguation(spark):
    """run_author_disambiguation(arbiter=...) completes the reference's
    pipeline shape: Tier-2 unknowns get llm_verdict, cache is returned."""
    from bibexpy_spark.operators import disambiguation as dis

    rows = [
        # same surname+initial block, several variants -> proposal
        ("r1", "Smith, J."), ("r2", "Smith, Jo."), ("r3", "Smith, Joh."),
        ("r4", "Lee, K."),
    ]
    records = spark.createDataFrame(rows, "UID string, AU string")

    def arbiter(payload: str) -> dict:
        return {"verdict": "merge"}

    res = dis.run_author_disambiguation(records, arbiter=arbiter)
    props = res["proposals"].collect()
    assert "arbitration_cache" in res
    t2_unknown = [r for r in props if r["tier"] == 2 and r["orcid_verdict"] == "unknown"]
    for r in t2_unknown:
        assert r["llm_verdict"] == "merge"
        assert r["llm_source"] in ("llm", "cache")
    # without an arbiter the shape is unchanged (no llm columns)
    res2 = dis.run_author_disambiguation(records)
    assert "llm_verdict" not in res2["proposals"].columns
