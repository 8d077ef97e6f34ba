"""spark-submit entry point for the transcript dedup pipeline.

The north rule's deployment contract: the pipeline runs via

    spark-submit --master <cluster> \\
        --py-files bibexpy_spark.zip \\
        jobs/dedup_job.py \\
        --input  <turns parquet/table>  \\
        --output <output dir>           \\
        --run-dir <warehouse dir for checkpoint/resume> \\
        [--no-simhash] [--containment] [--containment-mode prefix|general|general_sa] \\
        [--cluster-edges containment,simhash] [--shuffle-partitions N]

Delta mode (daily increments; each run writes the state the next needs —
signed signatures, clusters, and when the passes are on, the composed
containment / SimHash pair tables):

    ... dedup_job.py --incremental \\
        --input <new turns> --output <out2> \\
        --prior-signed <out1>/signed --prior-clusters <out1>/clusters \\
        [--prior-containment-prefix <out1>/containment_prefix] \\
        [--prior-containment-pairs <out1>/containment_pairs] \\
        [--prior-simhash-pairs <out1>/simhash_pairs]

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
    ap.add_argument(
        "--cluster-edges", default="",
        help="comma list of EXTRA cluster edge sources (containment,simhash) "
             "to union into connected components — the reference's "
             "merge_references fold-into-container semantics; default: those "
             "passes stay separate signals.  In --incremental mode the "
             "matching --prior-* pair state is required and the result "
             "equals a batch run with the same sources",
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
    ap.add_argument("--prior-containment-prefix", default=None,
                    help="prior containment_prefix pair state (a previous "
                         "run's <output>/containment_prefix); composed with "
                         "this delta's pairs in --incremental mode")
    ap.add_argument("--prior-containment-pairs", default=None,
                    help="prior containment_pairs state (general modes)")
    ap.add_argument("--prior-simhash-pairs", default=None,
                    help="prior simhash_pairs state")
    ap.add_argument("--make-zip", action="store_true",
                    help="write bibexpy_spark.zip for --py-files and exit")
    ap.add_argument("--bench-json", default=None,
                    help="write a scaling-leg JSON (cores, n_turns, wall_s, "
                         "n_clusters) for tools/submit_scaling.py: the wall "
                         "covers the pipeline DAG plus all output writes, "
                         "after a python-worker warmup (session-fixed cost, "
                         "paid once per executor on a real cluster)")
    args = ap.parse_args(argv)

    if args.make_zip:
        print(make_pyfiles_zip())
        return
    if not args.input or not args.output:
        ap.error("--input and --output are required (or use --make-zip)")

    edges = tuple(e for e in args.cluster_edges.split(",") if e)
    bad = set(edges) - {"containment", "simhash"}
    if bad:
        ap.error(f"unknown --cluster-edges source(s): {sorted(bad)}")
    if "containment" in edges and not args.containment:
        ap.error("--cluster-edges containment needs --containment")
    if "simhash" in edges and args.no_simhash:
        ap.error("--cluster-edges simhash conflicts with --no-simhash")
    if args.incremental:
        # the composed pair tables written to <output> ARE the state the
        # NEXT delta run reads — composing against a missing prior table
        # would silently truncate them to delta-only pairs and every later
        # run would inherit the loss, so each enabled pass hard-requires
        # its prior pair state here (any prior run with the pass on wrote
        # it; a prior state written WITHOUT the pass cannot serve a run
        # WITH it anyway — the signed-column checks below enforce that)
        if args.containment and not args.prior_containment_prefix:
            ap.error("--containment with --incremental needs "
                     "--prior-containment-prefix (the prior run's "
                     "containment_prefix output)")
        if (args.containment and args.containment_mode != "prefix"
                and not args.prior_containment_pairs):
            ap.error("--containment-mode general/general_sa with "
                     "--incremental needs --prior-containment-pairs (the "
                     "prior run's containment_pairs output; a prior run in "
                     "prefix mode never produced one — re-run the batch in "
                     "a general mode first)")
        if not args.no_simhash and not args.prior_simhash_pairs:
            ap.error("the SimHash pass with --incremental needs "
                     "--prior-simhash-pairs (the prior run's simhash_pairs "
                     "output); pass --no-simhash to skip the pass")

        # refuse in-place state updates: every prior table is read LAZILY
        # while the matching output is written with mode("overwrite") — if a
        # --prior-* path sits at/under --output, the overwrite deletes the
        # state mid-read (Spark's self-overwrite detection only covers
        # catalog tables, not file sources), corrupting the very state the
        # next delta run needs.  Daily increments must write a fresh
        # directory per run (docstring: out1 -> out2).
        def _norm(p: str) -> str:
            # a file:// scheme names the same local path realpath sees —
            # strip it first so mixed forms (--output file:///x/out vs
            # --prior-signed /x/out/signed) cannot evade the guard
            import re as _re

            m = _re.match(r"^file:/+", p)
            if m:
                p = "/" + p[m.end():]
            return p.rstrip("/") if "://" in p else os.path.realpath(p)

        out_n = _norm(args.output)
        for flag, path in [
            ("--prior-signed", args.prior_signed),
            ("--prior-clusters", args.prior_clusters),
            ("--prior-turns", args.prior_turns),
            ("--prior-containment-prefix", args.prior_containment_prefix),
            ("--prior-containment-pairs", args.prior_containment_pairs),
            ("--prior-simhash-pairs", args.prior_simhash_pairs),
        ]:
            if path and (_norm(path) == out_n
                         or _norm(path).startswith(out_n + os.sep)
                         or _norm(path).startswith(out_n + "/")):
                ap.error(f"{flag} {path!r} lies inside --output "
                         f"{args.output!r}: the overwrite would delete the "
                         "prior state while it is still being read lazily — "
                         "each incremental run must write a fresh output "
                         "directory")

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
    # signed-state columns: the base signature set, plus what the enabled
    # passes need to run delta-mode later (containment reads norm_text,
    # the fuzzy pass reads simhash) — a prior state written WITHOUT a pass
    # cannot serve an --incremental run WITH it
    _sig_cols = ["conv_id", "content_sha", "shingles", "band_hashes"]
    if args.containment:
        _sig_cols.append("norm_text")
    if not args.no_simhash:
        _sig_cols.append("simhash")

    if args.incremental:
        # delta mode: cluster the new batch against prior state; every run
        # writes the state the NEXT delta run needs (signed = old ∪ new,
        # pair tables = prior-minus-resigned ∪ delta), so daily increments
        # compose without ever re-reading the corpus
        if not args.prior_signed or not args.prior_clusters:
            ap.error("--incremental requires --prior-signed and --prior-clusters")
        from bibexpy_spark import incremental

        prior_signed = spark.read.parquet(args.prior_signed)
        prior_clusters = spark.read.parquet(args.prior_clusters)
        prior_turns = (
            spark.read.parquet(args.prior_turns) if args.prior_turns else None
        )
        if args.containment and "norm_text" not in prior_signed.columns:
            ap.error("--containment in --incremental mode needs a prior "
                     "signed state written with --containment (norm_text "
                     "column missing)")
        if not args.no_simhash and "simhash" not in prior_signed.columns:
            ap.error("the SimHash pass in --incremental mode needs a prior "
                     "signed state written without --no-simhash (simhash "
                     "column missing); pass --no-simhash to skip the pass")
        prior_extra = None
        if edges:
            from pyspark.sql import functions as F

            legs = []
            if "containment" in edges:
                cpath = (args.prior_containment_pairs
                         if args.containment_mode != "prefix"
                         else args.prior_containment_prefix)
                legs.append(
                    spark.read.parquet(cpath).select(
                        F.col("inner_id").alias("a_id"),
                        F.col("outer_id").alias("b_id"),
                    )
                )
            if "simhash" in edges:
                legs.append(
                    spark.read.parquet(args.prior_simhash_pairs)
                    .select("a_id", "b_id")
                )
            prior_extra = legs[0]
            for leg in legs[1:]:
                prior_extra = prior_extra.unionByName(leg)
        res = incremental.run_incremental_dedup(
            spark, turns, prior_signed, prior_clusters, cfg=CANONICAL,
            prior_turns=prior_turns,
            with_containment=args.containment,
            with_simhash_pass=not args.no_simhash,
            containment_mode=args.containment_mode,
            extra_cluster_edges=edges,
            prior_extra_pairs=prior_extra,
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

        def compose_pairs(delta_key: str, prior_path: str,
                          out_name: str, a: str, b: str) -> None:
            """Write the composed pair state via the single-sourced
            incremental.compose_pair_state (delta-op equivalence contract).
            prior_path is hard-required by the flag validation above —
            composing without it would silently truncate the state the
            next delta run reads to delta-only pairs."""
            incremental.compose_pair_state(
                spark.read.parquet(prior_path), res[delta_key],
                res["resigned_prior_ids"], a, b,
            ).write.mode("overwrite").parquet(
                os.path.join(args.output, out_name)
            )

        if args.containment:
            compose_pairs("containment_prefix_new", args.prior_containment_prefix,
                          "containment_prefix", "inner_id", "outer_id")
            if args.containment_mode != "prefix":
                compose_pairs("containment_pairs_new", args.prior_containment_pairs,
                              "containment_pairs", "inner_id", "outer_id")
        if not args.no_simhash:
            compose_pairs("simhash_pairs_new", args.prior_simhash_pairs,
                          "simhash_pairs", "a_id", "b_id")
        stats = res["stats"].first().asDict()
        print(f"dedup_job (incremental): {stats}", file=sys.stderr)
        spark.stop()
        return

    t_bench = None
    if args.bench_json:
        import time

        from bibexpy_spark.session import warm_python_workers

        n_turns_bench = turns.count()
        warm_python_workers(spark, spark.sparkContext.defaultParallelism)
        t_bench = time.time()

    run = None
    if args.run_dir:
        # plan-shaping flags ride the freshness token: a stage manifest is
        # only fresh when config, input AND flag set all match — otherwise a
        # resume after toggling e.g. --no-simhash would wrongly skip the
        # sign stage whose output schema the toggle changed
        flag_token = (
            f"|simhash={int(not args.no_simhash)}"
            f"|contain={int(args.containment)}:{args.containment_mode}"
            f"|edges={','.join(sorted(edges))}"
        )
        token = ("" if args.table else input_token_for_paths(args.input)) + flag_token
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
        extra_cluster_edges=edges,
    )
    n_clusters_bench = None
    wall_compute = None
    if t_bench is not None:
        # compute wall: cluster materialization via countDistinct — the
        # bench legs' exact protocol, through the REAL deployment artifact.
        # clusters is persisted FIRST so the countDistinct materializes the
        # DAG tail into cache and the subsequent output write replays the
        # cache instead of re-executing cluster compute — without this the
        # total wall double-counted the tail and its write term was NOT the
        # near-constant I/O cost it claimed to be (ADVICE r4).  The output
        # writes are still timed separately (wall_s total below): on this
        # single-disk sandbox the write term measures the disk, not the
        # plan, so it stays out of the efficiency ratio.
        import time

        from pyspark.sql import functions as F

        res["clusters"] = res["clusters"].persist()
        n_clusters_bench = res["clusters"].agg(
            F.countDistinct("cluster_id").alias("n")
        ).collect()[0]["n"]
        wall_compute = time.time() - t_bench
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
    if not args.no_simhash:
        res["simhash_pairs"].write.mode("overwrite").parquet(
            os.path.join(args.output, "simhash_pairs")
        )
    res["dup_edges"].write.mode("overwrite").parquet(
        os.path.join(args.output, "dup_edges")
    )
    # corpus state for later --incremental runs
    res["signed"].select(*_sig_cols).write.mode("overwrite").parquet(
        os.path.join(args.output, "signed")
    )
    if t_bench is not None:
        import json
        import time

        wall = time.time() - t_bench
        with open(args.bench_json, "w") as f:
            json.dump(
                {
                    "cores": spark.sparkContext.defaultParallelism,
                    "n_turns": n_turns_bench,
                    "wall_s": round(wall, 2),
                    "wall_compute_s": round(wall_compute, 2),
                    "n_clusters": n_clusters_bench,
                },
                f,
            )
    n = res["clusters"].count()
    print(f"dedup_job: wrote {n} cluster assignments to {args.output}",
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
