"""spark-submit --py-files scaling pair — the deployment-literal evidence.

bench.py's legs measure the pipeline in-process; this tool runs the ACTUAL
deployment artifact — ``spark-submit --master local[N] --py-files
bibexpy_spark.zip jobs/dedup_job.py`` — at a pair's two parallelism levels
in alternating cycles.  The wall is timed INSIDE the job (--bench-json):
pipeline DAG plus all output writes, after the python-worker warmup
(session-fixed cost, paid once per executor on a real cluster).  Flags
mirror the bench legs' config (--no-simhash, no containment) so the two
series measure the same DAG.

Cycle pairing and phase handling follow the bench protocol: a cycle is an
adjacent (lo, hi) pair sharing one host throttle phase; per-cycle
efficiency = (wall_lo / wall_hi) / (hi / lo); super-unity phase-flip cycles
are excluded from the best-cycle claim (bench.paired_best, PHASE_FLIP_TOL).

Usage:  python tools/submit_scaling.py [cycles] [lo] [hi] [corpus_parquet]
Writes data/submit_scaling.json; ``python bench.py --refresh-md`` renders
the BENCH.md section.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import classify_stderr, paired_best  # noqa: E402


def compute_cycles(legs: list[dict], lo: int, hi: int, key: str) -> list[float]:
    """Per-cycle efficiencies from the accumulated leg list.

    A cycle is an ADJACENT (lo, hi) leg pair in launch order — the
    same-phase premise.  Walk-pairing (not stride-2 indexing): each lo leg
    pairs with the IMMEDIATELY following leg iff that leg is a hi; any leg
    that cannot head a valid pair (failed, wrong cores, missing the wall
    key) is stepped over.  Stride indexing silently desynchronized after
    an odd-length prefix (r4: three artifact legs removed from the record
    shifted parity and dropped every later cycle); walk-pairing is
    parity-free and still never ratios non-adjacent legs — sessions start
    on lo, so a dangling trailing lo can only be followed by the next
    session's lo, which does not pair."""
    out = []
    i = 0
    while i < len(legs) - 1:
        a, b = legs[i], legs[i + 1]
        if (
            not a.get("failed") and not b.get("failed")
            and a.get("cores") == lo and b.get("cores") == hi
            and key in a and key in b
        ):
            out.append(round((a[key] / b[key]) / (hi / lo), 3))
            i += 2
        else:
            i += 1
    return out


def minima_efficiency(
    legs: list[dict], lo: int, hi: int, key: str
) -> tuple[dict, float | None]:
    """Per-level minimum walls and the minima-based efficiency for one
    wall key, over non-failed legs carrying that key."""
    by_level: dict[int, list[float]] = {lo: [], hi: []}
    for r in legs:
        if not r.get("failed") and key in r and r.get("cores") in by_level:
            by_level[r["cores"]].append(r[key])
    eff = (
        round((min(by_level[lo]) / min(by_level[hi])) / (hi / lo), 3)
        if by_level[lo] and by_level[hi] else None
    )
    return (
        {str(c): (min(v) if v else None) for c, v in by_level.items()},
        eff,
    )


def submit_leg(
    cores: int, zip_path: str, corpus: str, scratch: str, tag: str
) -> tuple[dict | None, str]:
    """One spark-submit leg; returns (bench-json dict, errors)."""
    out_dir = os.path.join(scratch, f"out_{tag}")
    bench_json = os.path.join(scratch, f"leg_{tag}.json")
    err_path = os.path.join(scratch, f"leg_{tag}.stderr")
    shutil.rmtree(out_dir, ignore_errors=True)
    timeout_s = int(os.environ.get("SPARK_GRAFT_LEG_TIMEOUT_S", "1800"))
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.driver.memory=48g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "dedup_job.py"),
        "--input", corpus,
        "--output", out_dir,
        "--no-simhash",
        "--bench-json", bench_json,
    ]
    with open(err_path, "w") as errf:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.DEVNULL, stderr=errf,
            env={**os.environ, "PYTHONPATH": REPO},
            start_new_session=True,
        )
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            import signal

            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
            return None, "hang_timeout"
    errors = classify_stderr(err_path)
    if rc != 0:
        return None, (errors + "," if errors != "none" else "") + f"exit:{rc}"
    try:
        return json.load(open(bench_json)), errors
    except (OSError, json.JSONDecodeError):
        return None, errors + ",no_output"


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    corpus = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.join(REPO, "data", "transcripts_bench_xl4.parquet")
    )
    if not os.path.exists(corpus):
        from bibexpy_spark import corpus as corpus_mod

        corpus = corpus_mod.write_parquet(corpus, 480_000, seed=45)

    # per-process scratch: a shared dir let a concurrent re-aggregation run
    # (cycles=0) wipe the zip out from under an in-flight session's legs
    # (observed r4 — the legs died with exit:1 through no fault of the
    # pipeline).  cycles=0 touches no scratch at all.
    scratch = os.path.join(
        REPO, "data", f"scratch_submit_scaling_{os.getpid()}"
    )
    if cycles > 0:
        shutil.rmtree(scratch, ignore_errors=True)
        os.makedirs(scratch)
        zip_path = os.path.join(scratch, "bibexpy_spark.zip")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"),
             "--make-zip"],
            cwd=scratch, check=True, stdout=subprocess.DEVNULL,
        )

    legs: list[dict] = []
    t_start = time.time()
    for i in range(cycles):
        for c in (lo, hi):
            tag = f"{i:02d}_{c}"
            r, errors = submit_leg(c, zip_path, corpus, scratch, tag)
            if r is None:
                print(f"[submit_scaling] leg {tag} FAILED: {errors}",
                      file=sys.stderr)
                legs.append({"cores": c, "errors": errors, "failed": True})
                continue
            r["errors"] = errors
            legs.append(r)
            print(json.dumps(r), flush=True)

    # cross-session accumulation (same minima protocol as the main bench
    # record): a prior submit_scaling.json for the SAME corpus/pair
    # contributes its legs; all cycle/minima stats recompute from the full
    # leg list.  Cycles never pair across a session boundary: every session
    # emits alternating lo,hi legs, and the cores guard below drops any
    # pairing desynchronized by a failed leg instead of ratioing walls from
    # different cycles.
    out_path = os.path.join(REPO, "data", "submit_scaling.json")
    if os.path.exists(out_path):
        prior = json.load(open(out_path))
        if (
            prior.get("corpus") == os.path.basename(corpus)
            and prior.get("pair") == [lo, hi]
        ):
            legs = prior["legs"] + legs

    ok = [r for r in legs if not r.get("failed")]
    n_cl = {r["n_clusters"] for r in ok}
    if len(n_cl) > 1:
        raise SystemExit(f"cluster counts diverged across legs: {sorted(n_cl)}")

    cycles_compute = compute_cycles(legs, lo, hi, "wall_compute_s")
    cycles_total = compute_cycles(legs, lo, hi, "wall_s")
    min_compute, eff_compute = minima_efficiency(legs, lo, hi, "wall_compute_s")
    min_total, eff_total = minima_efficiency(legs, lo, hi, "wall_s")
    out = {
        "corpus": os.path.basename(corpus),
        "n_turns": ok[0]["n_turns"] if ok else None,
        "n_clusters": sorted(n_cl)[0] if n_cl else None,
        "pair": [lo, hi],
        "legs": legs,
        "paired_cycles_compute": cycles_compute,
        "paired_best_compute": paired_best(cycles_compute),
        "paired_cycles_total": cycles_total,
        "paired_best_total": paired_best(cycles_total),
        "efficiency_minima_compute": eff_compute,
        "efficiency_minima_total": eff_total,
        "wall_compute_s_min": min_compute,
        "wall_s_min": min_total,
        "total_harness_s": round(time.time() - t_start, 1),
        "protocol": (
            "spark-submit --py-files bibexpy_spark.zip jobs/dedup_job.py "
            "--no-simhash; timed inside the job post worker-warmup: "
            "compute wall = cluster materialization (countDistinct — the "
            "bench legs' protocol), total wall adds all output writes "
            "(near-constant single-disk I/O term in this sandbox); "
            "alternating same-phase cycles; phase-flip cycles excluded "
            "from paired_best"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
