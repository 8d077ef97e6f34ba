"""Incremental dedup: batch-equivalence contract.

run_incremental_dedup(new_batch, prior_state) must produce EXACTLY the
cluster assignment a full batch run over (old ∪ new) produces — same
labels (min conv_id per component), every row — whenever no band bucket
exceeds hot_band_cap (true at fixture scale; see module docstring for the
star-bucket caveat).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark import corpus, incremental, pipeline
from bibexpy_spark.config import CANONICAL


@pytest.fixture(scope="module")
def split_corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("incr") / "turns.parquet")
    corpus.write_parquet(path, 400, seed=99)
    turns = spark.read.parquet(path)
    # deterministic 70/30 split on a stable hash of conv_id; duplicates of
    # old conversations routinely land in the new batch (the interesting case)
    is_new = F.abs(F.xxhash64("conv_id")) % 10 >= 7
    return turns.filter(~is_new).persist(), turns.filter(is_new).persist(), turns


def _cluster_set(df):
    return {(r["conv_id"], r["cluster_id"]) for r in df.collect()}


def test_incremental_equals_full_batch(spark, split_corpus):
    old_turns, new_turns, all_turns = split_corpus

    full = pipeline.run_dedup(
        spark, all_turns, with_containment=False, with_simhash_pass=False
    )
    prior = pipeline.run_dedup(
        spark, old_turns, with_containment=False, with_simhash_pass=False
    )
    incr = incremental.run_incremental_dedup(
        spark, new_turns, prior["signed"], prior["clusters"]
    )

    got = _cluster_set(incr["clusters"])
    want = _cluster_set(full["clusters"])
    assert got == want

    # the delta really is a delta: only new conversations were signed
    n_new = new_turns.select("conv_id").distinct().count()
    assert incr["signed_new"].count() == n_new

    stats = incr["stats"].first().asDict()
    assert stats["n_new"] == n_new
    # the fixture's duplicate classes guarantee cross-batch action
    assert stats["n_cross_exact"] + stats["n_dup_edges"] > 0


def test_incremental_remap_consistency(spark, split_corpus):
    """Every remapped prior cluster points at a label that exists in the
    final assignment, and labels are component minima (label <= members)."""
    old_turns, new_turns, _ = split_corpus
    prior = pipeline.run_dedup(
        spark, old_turns, with_containment=False, with_simhash_pass=False
    )
    incr = incremental.run_incremental_dedup(
        spark, new_turns, prior["signed"], prior["clusters"]
    )
    cl = incr["clusters"]
    assert cl.filter(F.col("cluster_id") > F.col("conv_id")).count() == 0
    labels = {r["cluster_id"] for r in cl.select("cluster_id").distinct().collect()}
    for r in incr["cluster_remap"].collect():
        assert r["cluster_id"] in labels
        assert r["cluster_id"] < r["old_cluster_id"]


def test_incremental_empty_delta_is_identity(spark, split_corpus):
    old_turns, _, _ = split_corpus
    prior = pipeline.run_dedup(
        spark, old_turns, with_containment=False, with_simhash_pass=False
    )
    empty = old_turns.filter(F.lit(False))
    incr = incremental.run_incremental_dedup(
        spark, empty, prior["signed"], prior["clusters"]
    )
    assert incr["cluster_remap"].count() == 0
    assert _cluster_set(incr["clusters"]) == _cluster_set(prior["clusters"])
