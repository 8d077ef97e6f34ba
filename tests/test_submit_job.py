"""End-to-end deployment-contract test: the pipeline runs via a REAL
`spark-submit --py-files bibexpy_spark.zip jobs/dedup_job.py` subprocess
(the north rule's execution mode), writes cluster assignments, and resumes
from its checkpoint manifests on a second invocation."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_roundtrip(tmp_path):
    from bibexpy_spark import corpus

    turns_path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    zip_path = str(tmp_path / "bibexpy_spark.zip")
    out_dir = str(tmp_path / "out")
    run_dir = str(tmp_path / "warehouse")

    # package the library exactly as a cluster submit would
    mk = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"), "--make-zip"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=120,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert mk.returncode == 0, mk.stderr[-2000:]
    assert os.path.exists(zip_path)

    def submit():
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "dedup_job.py"),
                "--input", turns_path,
                "--output", out_dir,
                "--run-dir", run_dir,
                "--run-id", "t1",
                "--no-simhash",
                "--containment",
                "--containment-mode", "general_sa",
            ],
            capture_output=True, text=True, timeout=600,
        )

    # expected assignment count = distinct conversations in the input
    # (derived, not hardcoded — ADVICE r3: a fixture-seed or duckdb-hash
    # bump must not fail the test without a real regression)
    import duckdb

    n_conv = duckdb.sql(
        f"SELECT count(DISTINCT conv_id) FROM read_parquet('{turns_path}')"
    ).fetchone()[0]

    r1 = submit()
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert f"wrote {n_conv} cluster assignments" in (r1.stdout + r1.stderr)

    # clusters parquet is readable and complete
    n = duckdb.sql(
        f"SELECT count(*), count(DISTINCT conv_id) FROM "
        f"read_parquet('{out_dir}/clusters/*.parquet')"
    ).fetchone()
    assert n[0] == n_conv and n[1] == n_conv

    # the general_sa containment mode wrote both containment outputs, and
    # every interior pair names two distinct conversations
    bad = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/containment_pairs/*.parquet') "
        f"WHERE inner_id = outer_id"
    ).fetchone()[0]
    assert bad == 0
    duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/containment_prefix/*.parquet')"
    ).fetchone()

    # second run with the same run-id resumes: every stage manifest is fresh
    manifests = [
        f for f in os.listdir(os.path.join(run_dir, "t1"))
        if f.endswith(".manifest.json")
    ]
    assert manifests, "no stage manifests written"
    r2 = submit()
    assert r2.returncode == 0, r2.stderr[-3000:]
    metrics_path = os.path.join(run_dir, "t1", "metrics.jsonl")
    if os.path.exists(metrics_path):
        rows = [json.loads(x) for x in open(metrics_path)]
        assert any(r.get("skipped") for r in rows), "resume did not skip stages"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_incremental_mode(tmp_path):
    """Deployment contract for delta runs: a batch submit writes corpus
    state (signed + clusters + containment pair state); an --incremental
    submit folds a new batch in and must reproduce the full-batch clustering
    AND the composed containment pair table exactly."""
    import duckdb

    from bibexpy_spark import corpus

    turns_path = corpus.corpus_path_for_sf("/root/testdata/sf0.001")
    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{turns_path}') "
        f"WHERE hash(conv_id) % 10 < 7) TO '{old_p}' (FORMAT parquet)"
    )
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{turns_path}') "
        f"WHERE hash(conv_id) % 10 >= 7) TO '{new_p}' (FORMAT parquet)"
    )

    zip_path = str(tmp_path / "bibexpy_spark.zip")
    mk = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"), "--make-zip"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=120,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert mk.returncode == 0, mk.stderr[-2000:]

    def submit(extra):
        return subprocess.run(
            [
                SPARK_SUBMIT, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "dedup_job.py"),
                "--no-simhash", "--containment",
                "--containment-mode", "general", *extra,
            ],
            capture_output=True, text=True, timeout=600,
        )

    out_full = str(tmp_path / "out_full")
    out_old = str(tmp_path / "out_old")
    out_incr = str(tmp_path / "out_incr")
    r = submit(["--input", turns_path, "--output", out_full])
    assert r.returncode == 0, r.stderr[-3000:]
    r = submit(["--input", old_p, "--output", out_old])
    assert r.returncode == 0, r.stderr[-3000:]
    r = submit([
        "--input", new_p, "--output", out_incr, "--incremental",
        "--prior-signed", os.path.join(out_old, "signed"),
        "--prior-clusters", os.path.join(out_old, "clusters"),
        "--prior-containment-prefix", os.path.join(out_old, "containment_prefix"),
        "--prior-containment-pairs", os.path.join(out_old, "containment_pairs"),
    ])
    assert r.returncode == 0, r.stderr[-3000:]

    diff = duckdb.sql(
        f"SELECT count(*) FROM ("
        f"  (SELECT conv_id, cluster_id FROM read_parquet('{out_incr}/clusters/*.parquet')"
        f"   EXCEPT"
        f"   SELECT conv_id, cluster_id FROM read_parquet('{out_full}/clusters/*.parquet'))"
        f"  UNION ALL"
        f"  (SELECT conv_id, cluster_id FROM read_parquet('{out_full}/clusters/*.parquet')"
        f"   EXCEPT"
        f"   SELECT conv_id, cluster_id FROM read_parquet('{out_incr}/clusters/*.parquet'))"
        f")"
    ).fetchone()[0]
    assert diff == 0, "incremental submit diverged from full-batch submit"
    # composed containment pair state == the full-batch pass over old ∪ new
    # (prior pairs minus resigned-touching, union delta pairs — the delta-op
    # equivalence contract, operationalized by the job's state composition)
    pair_diff = duckdb.sql(
        f"SELECT count(*) FROM ("
        f"  (SELECT inner_id, outer_id, pos FROM read_parquet('{out_incr}/containment_pairs/*.parquet')"
        f"   EXCEPT"
        f"   SELECT inner_id, outer_id, pos FROM read_parquet('{out_full}/containment_pairs/*.parquet'))"
        f"  UNION ALL"
        f"  (SELECT inner_id, outer_id, pos FROM read_parquet('{out_full}/containment_pairs/*.parquet')"
        f"   EXCEPT"
        f"   SELECT inner_id, outer_id, pos FROM read_parquet('{out_incr}/containment_pairs/*.parquet'))"
        f")"
    ).fetchone()[0]
    assert pair_diff == 0, "composed containment state diverged from batch"
    # the next-delta state is written and complete: one signed row per
    # distinct conversation across old + new (derived, not hardcoded)
    n_conv = duckdb.sql(
        f"SELECT count(DISTINCT conv_id) FROM ("
        f"SELECT conv_id FROM read_parquet('{old_p}') "
        f"UNION ALL SELECT conv_id FROM read_parquet('{new_p}'))"
    ).fetchone()[0]
    n_state = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_incr}/signed/*.parquet')"
    ).fetchone()[0]
    assert n_state == n_conv


def test_incremental_hard_requires_prior_pair_state_flags():
    """Regression (r4 review): --incremental with a pass enabled but its
    --prior-* pair flag missing used to compose the next-delta state from
    the delta pairs ALONE, silently dropping every prior pair; the job must
    refuse up front instead."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dedup_job_validation", os.path.join(REPO, "jobs", "dedup_job.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    base = ["--input", "in.parquet", "--output", "out", "--incremental"]
    # containment on, prefix state flag missing
    with pytest.raises(SystemExit):
        mod.main(base + ["--containment", "--no-simhash"])
    # general mode: prefix state present, general pair state missing
    with pytest.raises(SystemExit):
        mod.main(base + [
            "--containment", "--containment-mode", "general", "--no-simhash",
            "--prior-containment-prefix", "p",
        ])
    # simhash pass on (default), its pair state missing
    with pytest.raises(SystemExit):
        mod.main(base)


def test_incremental_refuses_in_place_state_overwrite(tmp_path):
    """Regression (r4 review): --incremental with a --prior-* path at/under
    --output would lazily read the prior state while write.mode("overwrite")
    deletes it (Spark's self-overwrite detection covers only catalog tables,
    not file sources) — the next delta's state silently corrupts.  The job
    must refuse before touching Spark."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dedup_job_inplace", os.path.join(REPO, "jobs", "dedup_job.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "state")
    base = ["--input", "in.parquet", "--output", out, "--incremental",
            "--no-simhash"]
    # prior table directly inside the output dir
    with pytest.raises(SystemExit):
        mod.main(base + ["--prior-signed", os.path.join(out, "signed"),
                         "--prior-clusters", str(tmp_path / "c")])
    # symlink alias of the output dir must not evade the guard
    (tmp_path / "state").mkdir()
    alias = tmp_path / "alias"
    alias.symlink_to(tmp_path / "state")
    with pytest.raises(SystemExit):
        mod.main(base + ["--prior-signed", str(tmp_path / "s"),
                         "--prior-clusters", str(alias / "clusters")])
    # scheme'd URIs compare textually (realpath must not mangle them)
    with pytest.raises(SystemExit):
        mod.main(["--input", "in.parquet", "--output", "s3://bkt/out/",
                  "--incremental", "--no-simhash",
                  "--prior-signed", "s3://bkt/out/signed",
                  "--prior-clusters", "s3://bkt/prior/clusters"])
    # mixed-form aliases (ADVICE r4): file:// scheme'd output vs plain
    # local prior path — and the reverse — name the same directory and
    # must not evade the guard
    with pytest.raises(SystemExit):
        mod.main(base[:2] + ["--output", "file://" + out, "--incremental",
                             "--no-simhash",
                             "--prior-signed", os.path.join(out, "signed"),
                             "--prior-clusters", str(tmp_path / "c")])
    with pytest.raises(SystemExit):
        mod.main(base + ["--prior-signed", "file://" + out + "/signed",
                         "--prior-clusters", str(tmp_path / "c")])
    # single-slash scheme form (Hadoop accepts file:/x) also normalizes
    with pytest.raises(SystemExit):
        mod.main(base + ["--prior-signed", "file:" + out + "/signed",
                         "--prior-clusters", str(tmp_path / "c")])
