"""Streaming incremental dedup: a micro-batch feed of conversation deltas
folded into the clustered-corpus state via ``foreachBatch``.

Contract (the same one the batch delta mode has): each micro-batch delivers
WHOLE conversations — the natural shape of a periodic export drop (one file
per day/hour of completed conversations).  Every batch runs the exact
``run_incremental_dedup`` operator against the persisted state (signed
signatures + cluster assignments) and atomically swaps the new state in, so
a chain of micro-batches starting from empty state equals one batch run
over the concatenation (batch equivalence by induction — tested with a
maxFilesPerTrigger=1 stream against the full-batch pipeline).

State layout under ``state_dir``:
    signed/    conv_id, content_sha, shingles, band_hashes  (grows per batch)
    clusters/  conv_id, cluster_id                          (full assignment)
    remaps/    batch_id, old_cluster_id, cluster_id         (append-only audit)

At 10^12-turn scale the state tables are Iceberg tables and the swap is a
snapshot commit; the parquet tmp-dir swap below is this sandbox's stand-in
(same pattern as lineage.RunContext.materialize).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bibexpy_spark.config import CANONICAL, DedupConfig
from bibexpy_spark.incremental import _SIG_COLS, run_incremental_dedup
from bibexpy_spark.streaming.ingest import read_turn_stream


def _stage(df: DataFrame, path: str) -> str:
    """Materialize to a tmp dir while the live state is still readable."""
    tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    return tmp


def _commit(path: str) -> None:
    """Replace the live dir with its staged tmp (state is only ever visible
    complete — the Iceberg-snapshot-commit stand-in)."""
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(path + ".tmp", path)


def foreach_batch_incremental_dedup(
    spark: SparkSession,
    source_path: str,
    state_dir: str,
    cfg: DedupConfig = CANONICAL,
    max_files_per_trigger: int | None = None,
):
    """Start the delta-folding stream; returns the StreamingQuery.

    ``max_files_per_trigger=1`` gives one micro-batch per dropped file —
    the deterministic shape the equivalence test uses."""
    stream = read_turn_stream(spark, source_path)
    if max_files_per_trigger is not None:
        stream = (
            spark.readStream.schema(stream.schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_path)
        )
    signed_p = os.path.join(state_dir, "signed")
    clusters_p = os.path.join(state_dir, "clusters")
    remaps_p = os.path.join(state_dir, "remaps")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        have_state = os.path.exists(signed_p)
        prior_s = spark.read.parquet(signed_p) if have_state else None
        prior_c = spark.read.parquet(clusters_p) if have_state else None
        res = run_incremental_dedup(spark, batch_df, prior_s, prior_c, cfg=cfg)
        new_signed = res["signed_new"].select(*_SIG_COLS)
        if have_state:
            new_signed = prior_s.select(*_SIG_COLS).unionByName(new_signed)
        # STAGE every output while the prior state dirs are still readable
        # (their lineage reads those parquets), THEN commit the swaps
        _stage(res["clusters"], clusters_p)
        res["cluster_remap"].withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(remaps_p)
        _stage(new_signed, signed_p)
        _commit(clusters_p)
        _commit(signed_p)

    return (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .start()
    )
