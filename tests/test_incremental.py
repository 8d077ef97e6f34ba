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
from pyspark.sql import Window as W

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


def _grown_split(turns):
    """Phase split where the delta GROWS conversations: a subset of old
    conversations holds back its final turn; the delta delivers brand-new
    conversations plus those held-back turns."""
    w = W.partitionBy("conv_id")
    t2 = turns.withColumn("_mx", F.max("turn_idx").over(w))
    is_new_conv = F.abs(F.xxhash64("conv_id")) % 10 >= 8
    is_grown = (~is_new_conv) & (F.abs(F.xxhash64("conv_id", F.lit(1))) % 4 == 0)
    held = is_grown & (F.col("turn_idx") == F.col("_mx")) & (F.col("_mx") > 0)
    old_phase = t2.filter(~is_new_conv & ~held).drop("_mx")
    delta = t2.filter(is_new_conv | held).drop("_mx")
    return old_phase.persist(), delta.persist()


def _state_tables(spark, res, tmp_path, tag):
    """Write a pipeline run's state the way production holds it (tables),
    read it back — the incremental contract's prior_signed/prior_clusters
    are state tables, and table-backed lineage keeps plans shallow."""
    sp = str(tmp_path / f"{tag}_signed")
    cp = str(tmp_path / f"{tag}_clusters")
    res["signed"].write.mode("overwrite").parquet(sp)
    res["clusters"].write.mode("overwrite").parquet(cp)
    return spark.read.parquet(sp), spark.read.parquet(cp)


def test_grown_conversation_delta_equals_batch(spark, split_corpus, tmp_path):
    """Retract-and-resign (VERDICT r3 ask #2): a delta that appends turns to
    already-clustered conversations must reproduce the full-batch clustering
    over the FINAL turn set exactly."""
    _, _, all_turns = split_corpus
    old_phase, delta = _grown_split(all_turns)
    try:
        prior = pipeline.run_dedup(
            spark, old_phase, with_containment=False, with_simhash_pass=False
        )
        prior_s, prior_c = _state_tables(spark, prior, tmp_path, "g")
        incr = incremental.run_incremental_dedup(
            spark, delta, prior_s, prior_c,
            prior_turns=old_phase,
        )
        full = pipeline.run_dedup(
            spark, all_turns, with_containment=False, with_simhash_pass=False
        )
        assert _cluster_set(incr["clusters"]) == _cluster_set(full["clusters"])

        stats = incr["stats"].first().asDict()
        # the split genuinely exercised the grown path
        n_grown = (
            delta.select("conv_id").distinct()
            .join(old_phase.select("conv_id").distinct(), "conv_id", "left_semi")
            .count()
        )
        assert n_grown > 0
        assert stats["n_retracted_clusters"] > 0
        # signed_new covers every delta conversation exactly once
        # (grown ones re-signed over the merged turn set)
        assert incr["signed_new"].count() == delta.select("conv_id").distinct().count()
        # the re-signed signature matches a fresh full-batch signing: the
        # grown conversations' final clustering above already implies it
        incr["cleanup"]()
    finally:
        old_phase.unpersist()
        delta.unpersist()


def test_grown_turn_edit_latest_wins(spark, split_corpus, tmp_path):
    """A delta that RE-DELIVERS an existing (conv_id, turn_idx) with new text
    overrides the prior row (latest-wins), matching a batch run over the
    edited turn set."""
    old_turns, _, _ = split_corpus
    edited = (
        old_turns.filter(F.abs(F.xxhash64("conv_id")) % 5 == 0)
        .filter(F.col("turn_idx") == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(" edited tail marker")))
    ).persist()
    assert edited.count() > 0
    prior = pipeline.run_dedup(
        spark, old_turns, with_containment=False, with_simhash_pass=False
    )
    prior_s, prior_c = _state_tables(spark, prior, tmp_path, "e")
    incr = incremental.run_incremental_dedup(
        spark, edited, prior_s, prior_c, prior_turns=old_turns
    )
    final_turns = (
        old_turns.join(
            edited.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
        )
        .select(*old_turns.columns)
        .unionByName(edited)
    )
    full = pipeline.run_dedup(
        spark, final_turns, with_containment=False, with_simhash_pass=False
    )
    assert _cluster_set(incr["clusters"]) == _cluster_set(full["clusters"])
    edited.unpersist()


def _pairset(df, cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_incremental_contain_simhash_equals_batch(spark, split_corpus, tmp_path):
    """VERDICT r3 ask #5: the incremental mode extended to the contain and
    fuzzy (SimHash) passes.  With a GROWN delta (the hardest shape):

        prior_pairs minus pairs touching resigned ids ∪ delta_pairs
            == batch pass over the final corpus

    for both pair sets, while cluster equivalence still holds."""
    _, _, all_turns = split_corpus
    old_phase, delta = _grown_split(all_turns)
    try:
        full = pipeline.run_dedup(
            spark, all_turns, with_containment=True, with_simhash_pass=True
        )
        prior = pipeline.run_dedup(
            spark, old_phase, with_containment=True, with_simhash_pass=True
        )
        prior_s, prior_c = _state_tables(spark, prior, tmp_path, "cs")
        incr = incremental.run_incremental_dedup(
            spark, delta, prior_s, prior_c, prior_turns=old_phase,
            with_containment=True, with_simhash_pass=True,
        )
        assert _cluster_set(incr["clusters"]) == _cluster_set(full["clusters"])

        resigned = {r["conv_id"] for r in incr["resigned_prior_ids"].collect()}
        assert resigned, "split produced no grown conversations"
        delta_ids = {
            r["conv_id"] for r in delta.select("conv_id").distinct().collect()
        }

        for prior_key, delta_key, full_key, cols in (
            ("containment_prefix", "containment_prefix_new",
             "containment_prefix", ["inner_id", "outer_id"]),
            ("simhash_pairs", "simhash_pairs_new",
             "simhash_pairs", ["a_id", "b_id", "hamming"]),
        ):
            p_prior = {
                t for t in _pairset(prior[prior_key], cols)
                if t[0] not in resigned and t[1] not in resigned
            }
            p_delta = _pairset(incr[delta_key], cols)
            p_full = _pairset(full[full_key], cols)
            assert p_prior | p_delta == p_full, delta_key
            # the delta output really is a delta: every pair touches a
            # delta conversation
            assert all(
                t[0] in delta_ids or t[1] in delta_ids for t in p_delta
            ), delta_key
        incr["cleanup"]()
    finally:
        old_phase.unpersist()
        delta.unpersist()


def test_grown_without_prior_turns_raises(spark, split_corpus):
    """Contract guard: a grown delta without prior_turns must fail loudly,
    never enter a second same-conv_id row (silent corruption)."""
    old_turns, _, _ = split_corpus
    prior = pipeline.run_dedup(
        spark, old_turns, with_containment=False, with_simhash_pass=False
    )
    regrown = old_turns.limit(50)
    with pytest.raises(ValueError, match="prior_turns"):
        incremental.run_incremental_dedup(
            spark, regrown, prior["signed"], prior["clusters"]
        )


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


def test_incremental_extra_edges_equals_batch(spark, split_corpus, tmp_path):
    """Capstone: extra_cluster_edges in INCREMENTAL mode, grown delta, equals
    the batch run folding the same sources.  The three edge legs compose:
    quiet-cluster connectivity rides the contracted prior super-nodes, pairs
    touching dissolved clusters come from the maintained prior pair state,
    >=1-new-endpoint pairs from the delta ops."""
    _, _, all_turns = split_corpus
    old_phase, delta = _grown_split(all_turns)
    EDGES = ("containment", "simhash")
    kw = dict(
        with_containment=True, with_simhash_pass=True, containment_mode="general"
    )
    try:
        full = pipeline.run_dedup(
            spark, all_turns, extra_cluster_edges=EDGES, **kw
        )
        prior = pipeline.run_dedup(
            spark, old_phase, extra_cluster_edges=EDGES, **kw
        )
        prior_s, prior_c = _state_tables(spark, prior, tmp_path, "xe")
        # the maintained pair state, normalized the way the job/stream would
        # union their state tables
        psp = str(tmp_path / "xe_pairs")
        prior["containment_pairs"].select(
            F.col("inner_id").alias("a_id"), F.col("outer_id").alias("b_id")
        ).unionByName(
            prior["simhash_pairs"].select("a_id", "b_id")
        ).write.mode("overwrite").parquet(psp)

        incr = incremental.run_incremental_dedup(
            spark, delta, prior_s, prior_c, prior_turns=old_phase,
            extra_cluster_edges=EDGES,
            prior_extra_pairs=spark.read.parquet(psp),
            **kw,
        )
        assert _cluster_set(incr["clusters"]) == _cluster_set(full["clusters"])
        # the fold genuinely coarsens vs the no-extra-edges run (otherwise
        # this test proves nothing about the extra legs)
        plain = pipeline.run_dedup(
            spark, all_turns, with_containment=False, with_simhash_pass=False
        )
        n_plain = plain["clusters"].select("cluster_id").distinct().count()
        n_fold = full["clusters"].select("cluster_id").distinct().count()
        assert n_fold < n_plain
        incr["cleanup"]()
    finally:
        old_phase.unpersist()
        delta.unpersist()


def test_incremental_extra_edges_grown_requires_pair_state(
    spark, split_corpus, tmp_path
):
    """A grown delta dissolves clusters; without the maintained pair state
    their surviving extra edges are unrecoverable — must fail loudly."""
    _, _, all_turns = split_corpus
    old_phase, delta = _grown_split(all_turns)
    try:
        prior = pipeline.run_dedup(
            spark, old_phase, with_containment=True, with_simhash_pass=False
        )
        prior_s, prior_c = _state_tables(spark, prior, tmp_path, "xr")
        with pytest.raises(ValueError, match="prior_extra_pairs"):
            incremental.run_incremental_dedup(
                spark, delta, prior_s, prior_c, prior_turns=old_phase,
                with_containment=True,
                extra_cluster_edges=("containment",),
            )
    finally:
        old_phase.unpersist()
        delta.unpersist()


def test_purely_new_delta_defensive_prior_turns_no_pair_state_needed(
    spark, split_corpus, tmp_path
):
    """A delta of ONLY new conversations dissolves no cluster, so the
    maintained pair state is legitimately unused — passing prior_turns
    defensively (the docstring recommends it) must not trip the
    prior_extra_pairs requirement.  Regression: `carried` used to become an
    empty-but-not-None frame whenever prior_turns was supplied, spuriously
    raising ValueError on a perfectly valid call."""
    old_turns, new_turns, all_turns = split_corpus
    EDGES = ("containment",)
    kw = dict(
        with_containment=True, with_simhash_pass=False,
        containment_mode="prefix",
    )
    prior = pipeline.run_dedup(spark, old_turns, extra_cluster_edges=EDGES, **kw)
    prior_s, prior_c = _state_tables(spark, prior, tmp_path, "pn")
    incr = incremental.run_incremental_dedup(
        spark, new_turns, prior_s, prior_c, prior_turns=old_turns,
        extra_cluster_edges=EDGES, prior_extra_pairs=None, **kw,
    )
    full = pipeline.run_dedup(spark, all_turns, extra_cluster_edges=EDGES, **kw)
    assert _cluster_set(incr["clusters"]) == _cluster_set(full["clusters"])
    incr["cleanup"]()


def test_prior_signed_without_prior_clusters_raises(spark, split_corpus):
    """prior_signed without prior_clusters must fail loudly: the emitted
    'clusters' would silently omit every quiet old conversation (r4
    review; mirrors the prior_turns guard)."""
    old_turns, new_turns, _ = split_corpus
    prior = pipeline.run_dedup(
        spark, old_turns, with_containment=False, with_simhash_pass=False
    )
    with pytest.raises(ValueError, match="without prior_clusters"):
        incremental.run_incremental_dedup(
            spark, new_turns, prior["signed"], None
        )
