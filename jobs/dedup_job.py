"""spark-submit entry point for the transcript dedup pipeline.

The north rule's deployment contract: the pipeline runs via

    spark-submit --master <cluster> \\
        --py-files bibexpy_spark.zip \\
        jobs/dedup_job.py \\
        --input  <turns parquet/table>  \\
        --output <output dir>           \\
        --run-dir <warehouse dir for checkpoint/resume> \\
        [--no-simhash] [--containment] [--containment-mode prefix|general|general_sa] [--shuffle-partitions N]

Delta mode (daily increments; each run writes the state the next needs):

    ... dedup_job.py --incremental \\
        --input <new turns> --output <out2> \\
        --prior-signed <out1>/signed --prior-clusters <out1>/clusters

The script takes the ambient SparkSession from spark-submit (no master
override — the cluster manager decides), runs the full
assemble→sign→exact→LSH→verify→cluster DAG with per-stage checkpoint
manifests (resume: rerunning with the same --run-dir and unchanged input
skips every fresh stage), and writes clusters, dup edges, and the metrics
log to --output.

Build the --py-files archive with:  python jobs/dedup_job.py --make-zip
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def make_pyfiles_zip(out_path: str = "bibexpy_spark.zip") -> str:
    """Package the library for --py-files (pure-python, no build step)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "bibexpy_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="turns parquet path (or table with --table)")
    ap.add_argument("--table", action="store_true",
                    help="treat --input as a catalog table name (Iceberg etc.)")
    ap.add_argument("--output", help="output directory")
    ap.add_argument("--run-dir", default=None,
                    help="warehouse dir for checkpoint/resume manifests")
    ap.add_argument("--run-id", default="submit",
                    help="run id inside --run-dir (stable id = resumable)")
    ap.add_argument("--no-simhash", action="store_true")
    ap.add_argument("--containment", action="store_true")
    ap.add_argument(
        "--containment-mode", choices=["prefix", "general", "general_sa"],
        default="prefix",
        help="prefix = lossless equi-join pass only; general/general_sa also "
             "run the complete prefix+interior pass (JVM instr / per-outer "
             "suffix-array verify) and write containment_pairs",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--incremental", action="store_true",
                    help="treat --input as a DELTA batch against prior state")
    ap.add_argument("--prior-signed", default=None,
                    help="prior corpus signatures parquet (a previous run's "
                         "<output>/signed)")
    ap.add_argument("--prior-clusters", default=None,
                    help="prior cluster assignments parquet (a previous "
                         "run's <output>/clusters)")
    ap.add_argument("--prior-turns", default=None,
                    help="previously ingested turn rows (parquet) — required "
                         "when the delta appends turns to conversations "
                         "already in --prior-signed (retract-and-resign)")
    ap.add_argument("--make-zip", action="store_true",
                    help="write bibexpy_spark.zip for --py-files and exit")
    args = ap.parse_args(argv)

    if args.make_zip:
        print(make_pyfiles_zip())
        return
    if not args.input or not args.output:
        ap.error("--input and --output are required (or use --make-zip)")

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("bibexpy_dedup")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from bibexpy_spark import pipeline
    from bibexpy_spark.config import CANONICAL
    from bibexpy_spark.lineage import RunContext, input_token_for_paths

    turns = (
        spark.table(args.input) if args.table else spark.read.parquet(args.input)
    )
    _sig_cols = ["conv_id", "content_sha", "shingles", "band_hashes"]

    if args.incremental:
        # delta mode: cluster the new batch against prior state; every run
        # writes the state the NEXT delta run needs (signed = old ∪ new),
        # so daily increments compose without ever re-signing the corpus
        if not args.prior_signed or not args.prior_clusters:
            ap.error("--incremental requires --prior-signed and --prior-clusters")
        from bibexpy_spark import incremental

        prior_signed = spark.read.parquet(args.prior_signed)
        prior_clusters = spark.read.parquet(args.prior_clusters)
        prior_turns = (
            spark.read.parquet(args.prior_turns) if args.prior_turns else None
        )
        res = incremental.run_incremental_dedup(
            spark, turns, prior_signed, prior_clusters, cfg=CANONICAL,
            prior_turns=prior_turns,
        )
        res["clusters"].write.mode("overwrite").parquet(
            os.path.join(args.output, "clusters")
        )
        res["cluster_remap"].write.mode("overwrite").parquet(
            os.path.join(args.output, "cluster_remap")
        )
        # next-delta state: signed_new supersedes any prior row for the same
        # conv_id (grown conversations were retracted and re-signed)
        prior_signed.select(*_sig_cols).join(
            res["signed_new"].select("conv_id"), "conv_id", "left_anti"
        ).unionByName(
            res["signed_new"].select(*_sig_cols)
        ).write.mode("overwrite").parquet(os.path.join(args.output, "signed"))
        stats = res["stats"].first().asDict()
        print(f"dedup_job (incremental): {stats}", file=sys.stderr)
        spark.stop()
        return

    run = None
    if args.run_dir:
        token = "" if args.table else input_token_for_paths(args.input)
        run = RunContext(
            spark, cfg=CANONICAL, warehouse=args.run_dir,
            run_id=args.run_id, input_token=token,
        )
    res = pipeline.run_dedup(
        spark,
        turns,
        cfg=CANONICAL,
        run=run,
        with_containment=args.containment,
        with_simhash_pass=not args.no_simhash,
        containment_mode=args.containment_mode,
    )
    res["clusters"].write.mode("overwrite").parquet(
        os.path.join(args.output, "clusters")
    )
    if args.containment:
        res["containment_prefix"].write.mode("overwrite").parquet(
            os.path.join(args.output, "containment_prefix")
        )
        if args.containment_mode != "prefix":
            res["containment_pairs"].write.mode("overwrite").parquet(
                os.path.join(args.output, "containment_pairs")
            )
    res["dup_edges"].write.mode("overwrite").parquet(
        os.path.join(args.output, "dup_edges")
    )
    # corpus state for later --incremental runs
    res["signed"].select(*_sig_cols).write.mode("overwrite").parquet(
        os.path.join(args.output, "signed")
    )
    n = res["clusters"].count()
    print(f"dedup_job: wrote {n} cluster assignments to {args.output}",
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
