"""Streaming incremental dedup: micro-batch chain == one full batch run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bibexpy_spark import corpus, pipeline
from bibexpy_spark.streaming import incremental_stream as istream


def test_stream_of_deltas_equals_full_batch(spark, tmp_path):
    """Drop the fixture corpus as THREE delta files into a stream source,
    fold them with maxFilesPerTrigger=1 (one micro-batch per file), and the
    final state clustering must equal the full-batch pipeline exactly."""
    src = tmp_path / "feed"
    src.mkdir()
    state = str(tmp_path / "state")

    all_path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    turns = spark.read.parquet(all_path)
    bucket = F.abs(F.xxhash64("conv_id")) % 3
    for i in range(3):
        turns.filter(bucket == i).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"part{i}")
        )
    # move one parquet file per delta into the feed dir (stable order)
    import glob
    import shutil

    for i in range(3):
        f = glob.glob(str(tmp_path / f"part{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(src / f"delta_{i}.parquet"))

    q = istream.foreach_batch_incremental_dedup(
        spark, str(src), state, max_files_per_trigger=1
    )
    q.awaitTermination(300)

    got = {
        (r["conv_id"], r["cluster_id"])
        for r in spark.read.parquet(os.path.join(state, "clusters")).collect()
    }
    full = pipeline.run_dedup(
        spark, turns, with_containment=False, with_simhash_pass=False
    )
    want = {(r["conv_id"], r["cluster_id"]) for r in full["clusters"].collect()}
    assert got == want

    n_state = spark.read.parquet(os.path.join(state, "signed")).count()
    assert n_state == turns.select("conv_id").distinct().count()
    # remap audit exists when later deltas merged earlier clusters
    if os.path.exists(os.path.join(state, "remaps")):
        remaps = spark.read.parquet(os.path.join(state, "remaps"))
        assert {"batch_id", "old_cluster_id", "cluster_id"} <= set(remaps.columns)


def test_stream_pair_state_equals_batch_passes(spark, tmp_path):
    """With the optional passes on, the streamed pair state after the last
    micro-batch equals the batch pipeline's containment/SimHash outputs
    over everything ingested (composition: prior minus resigned ∪ delta)."""
    src = tmp_path / "feed"
    src.mkdir()
    state = str(tmp_path / "state")

    all_path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    turns = spark.read.parquet(all_path)
    bucket = F.abs(F.xxhash64("conv_id")) % 2
    import glob
    import shutil

    for i in range(2):
        turns.filter(bucket == i).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"part{i}")
        )
        f = glob.glob(str(tmp_path / f"part{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(src / f"delta_{i}.parquet"))

    q = istream.foreach_batch_incremental_dedup(
        spark, str(src), state, max_files_per_trigger=1,
        with_containment=True, with_simhash_pass=True,
        containment_mode="general",
    )
    q.awaitTermination(300)

    full = pipeline.run_dedup(
        spark, turns, with_containment=True, with_simhash_pass=True,
        containment_mode="general",
    )
    for subdir, key, cols in [
        ("containment_prefix", "containment_prefix", ["inner_id", "outer_id"]),
        ("containment_pairs", "containment_pairs", ["inner_id", "outer_id", "pos"]),
        ("simhash_pairs", "simhash_pairs", ["a_id", "b_id", "hamming"]),
    ]:
        got = {
            tuple(r[c] for c in cols)
            for r in spark.read.parquet(os.path.join(state, subdir)).collect()
        }
        want = {tuple(r[c] for c in cols) for r in full[key].select(*cols).collect()}
        assert got == want, f"{subdir}: streamed state != batch pass"
    # signed state carries the pass columns for the next delta
    sig_cols = set(spark.read.parquet(os.path.join(state, "signed")).columns)
    assert {"norm_text", "simhash"} <= sig_cols


def test_stream_extra_edges_equals_batch(spark, tmp_path):
    """A micro-batch chain folding containment edges (feeding its own
    maintained pair state back per batch) ends at exactly the clustering of
    one batch run with the same edge sources."""
    src = tmp_path / "feed"
    src.mkdir()
    state = str(tmp_path / "state")

    all_path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    turns = spark.read.parquet(all_path)
    bucket = F.abs(F.xxhash64("conv_id")) % 2
    import glob
    import shutil

    for i in range(2):
        turns.filter(bucket == i).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"part{i}")
        )
        f = glob.glob(str(tmp_path / f"part{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(src / f"delta_{i}.parquet"))

    q = istream.foreach_batch_incremental_dedup(
        spark, str(src), state, max_files_per_trigger=1,
        with_containment=True, containment_mode="general",
        extra_cluster_edges=("containment",),
    )
    q.awaitTermination(300)

    full = pipeline.run_dedup(
        spark, turns, with_containment=True, with_simhash_pass=False,
        containment_mode="general", extra_cluster_edges=("containment",),
    )
    got = {
        (r["conv_id"], r["cluster_id"])
        for r in spark.read.parquet(os.path.join(state, "clusters")).collect()
    }
    want = {(r["conv_id"], r["cluster_id"]) for r in full["clusters"].collect()}
    assert got == want


def test_recover_pending_swap_rolls_forward(spark, tmp_path):
    """Crash-atomicity of the multi-table state swap (r4 review): a crash
    BETWEEN the per-table commits leaves the write-ahead intent on disk;
    recovery must complete the remaining commits, fold the staged remap
    delta, write the batch's committed marker (so its checkpoint replay
    no-ops), and remove the intent — never leaving mixed old/new state."""
    import json

    state = str(tmp_path / "state")
    os.makedirs(state)
    clusters_p = os.path.join(state, "clusters")
    signed_p = os.path.join(state, "signed")
    turns_p = os.path.join(state, "turns")

    old = spark.createDataFrame([("c1", "OLD")], "conv_id string, v string")
    new = spark.createDataFrame([("c1", "NEW"), ("c2", "NEW")],
                                "conv_id string, v string")
    for p in (clusters_p, signed_p, turns_p):
        old.write.mode("overwrite").parquet(p)
        new.write.mode("overwrite").parquet(p + ".tmp")

    # simulate the crash: intent published, ONE table already committed
    with open(os.path.join(state, "_swap_intent.tmp"), "w") as fh:
        json.dump({"batch_id": 7, "paths": [clusters_p, signed_p, turns_p]}, fh)
    os.replace(os.path.join(state, "_swap_intent.tmp"),
               os.path.join(state, "_swap_intent"))
    istream._commit(clusters_p)  # crash happened right after this one
    remap_tmp = os.path.join(state, "_remap_delta_7")
    spark.createDataFrame([("x", "y")], "old_cluster_id string, cluster_id string") \
        .coalesce(1).write.mode("overwrite").parquet(remap_tmp)

    assert istream.recover_pending_swap(state) is True

    for p in (clusters_p, signed_p, turns_p):
        rows = {r["v"] for r in spark.read.parquet(p).collect()}
        assert rows == {"NEW"}, p
        assert not os.path.exists(p + ".tmp")
    assert not os.path.exists(os.path.join(state, "_swap_intent"))
    assert os.path.exists(os.path.join(state, "_committed", "7"))
    assert not os.path.exists(remap_tmp)
    remap_files = os.listdir(os.path.join(state, "remaps"))
    assert any(f.startswith("batch7-") for f in remap_files)
    # idempotent: a second call is a no-op
    assert istream.recover_pending_swap(state) is False


def test_stream_refuses_signed_state_without_turns(spark, tmp_path):
    """A state dir with signed/ but no turns/ (pre-turn-tracking layout)
    must fail LOUDLY at the first batch instead of silently seeding a
    partial turns state — a later grown conversation from before the gap
    would otherwise re-sign over an incomplete turn set without tripping
    the no-prior-turns guard (r4 review)."""
    src = tmp_path / "feed"
    src.mkdir()
    state = str(tmp_path / "state")

    all_path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    turns = spark.read.parquet(all_path)
    keep = F.abs(F.xxhash64("conv_id")) % 10
    turns.filter(keep == 0).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "d0")
    )
    import glob
    import shutil

    shutil.copy(
        glob.glob(str(tmp_path / "d0" / "part-*.parquet"))[0],
        str(src / "delta_0.parquet"),
    )
    # forge the legacy layout: signed/ + clusters/ present, turns/ absent
    from bibexpy_spark import incremental as inc

    res = inc.run_incremental_dedup(
        spark, turns.filter(keep == 1), None, None
    )
    os.makedirs(state, exist_ok=True)
    res["signed_new"].write.parquet(os.path.join(state, "signed"))
    res["clusters"].write.parquet(os.path.join(state, "clusters"))
    res["cleanup"]()

    q = istream.foreach_batch_incremental_dedup(
        spark, str(src), state, max_files_per_trigger=1
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="no turns/"):
        q.awaitTermination(300)


def test_ckpt_identity_guard(tmp_path):
    """_committed markers belong to ONE checkpoint lifetime: replacing
    _ckpt while keeping the state tables restarts batch numbering, so the
    stale markers would silently skip new batches — the guard must refuse
    (r4 review).  Pure-filesystem unit test."""
    import json

    from bibexpy_spark.streaming.incremental_stream import _check_ckpt_identity

    state = str(tmp_path / "state")
    marker_dir = os.path.join(state, "_committed")
    meta_dir = os.path.join(state, "_ckpt")
    os.makedirs(meta_dir)
    # no metadata yet -> no-op
    _check_ckpt_identity(state, marker_dir)
    json.dump({"id": "q-1"}, open(os.path.join(meta_dir, "metadata"), "w"))
    _check_ckpt_identity(state, marker_dir)      # records q-1
    assert open(os.path.join(marker_dir, "_ckpt_id")).read() == "q-1"
    _check_ckpt_identity(state, marker_dir)      # same id: fine
    json.dump({"id": "q-2"}, open(os.path.join(meta_dir, "metadata"), "w"))
    with pytest.raises(ValueError, match="reset or replaced"):
        _check_ckpt_identity(state, marker_dir)
