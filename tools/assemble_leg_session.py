"""Assemble raw `bench.py --leg` outputs into a session-result dict that
tools/merge_bench_sessions.py accepts.

Why: unattended leg loops (cycling one scaling pair while the host hunts for
a clean throttle phase) write per-leg JSONs + stderr captures, not the full
session dict main() prints.  This packs them: per level, runs concatenate
in file order (cycle order — the paired-cycle estimator needs lo/hi run i
to share a throttle phase); errors classify from the sibling .stderr.

Usage:
  python tools/assemble_leg_session.py out.json CORPUS_NAME PAIR_LO PAIR_HI \
      lo1.json hi1.json lo2.json hi2.json [...]

CORPUS_NAME is the session scheme key ("xl4" = the r4-late 4x primary).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import classify_stderr, paired_best  # noqa: E402


def assemble(
    corpus_name: str, lo: int, hi: int, leg_paths: list[str]
) -> dict:
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    ordered: list[dict] = []
    for p in leg_paths:
        r = json.load(open(p))
        err_path = os.path.splitext(p)[0] + ".stderr"
        r["errors"] = (
            classify_stderr(err_path) if os.path.exists(err_path) else "uncaptured"
        )
        if r["cores"] not in runs:
            raise SystemExit(f"{p}: cores={r['cores']} not in pair ({lo},{hi})")
        r["_path"] = p
        runs[r["cores"]].append(r)
        ordered.append(r)
    # one corpus, one kernel slice per session — a mixed file list would
    # produce meaningless minima (same guard class as merge_bench_sessions)
    for key in ("n_turns", "kernel_n_turns"):
        vals = {r.get(key) for r in ordered}
        if len(vals) > 1:
            # key=repr: a leg file missing the key contributes None, which
            # must render in the diagnostic, not raise TypeError in sorted
            raise SystemExit(
                f"legs disagree on {key}: {sorted(vals, key=repr)}"
            )

    legs: dict[str, dict] = {}
    for c, rs in runs.items():
        if not rs:
            continue
        best = min(rs, key=lambda r: r["wall_s"])
        s = {k: v for k, v in best.items() if k != "_path"}
        s["all_runs_s"] = [r["wall_s"] for r in rs]
        s["kernel_all_runs_s"] = [r["kernel_s"] for r in rs]
        s["kernel_s"] = min(s["kernel_all_runs_s"])
        s["turns_per_sec"] = round(s["n_turns"] / s["wall_s"], 1)
        s["kernel_turns_per_sec"] = round(
            s.get("kernel_n_turns", s["n_turns"]) / s["kernel_s"], 1
        )
        s["errors"] = sorted({r["errors"] for r in rs})
        legs[f"local[{c}]"] = s

    label = f"linear_{lo}_{hi}" if hi == 4 * lo else f"pair_{lo}_{hi}"
    pair: dict = {}
    # a cycle = an ADJACENT (lo, hi) file pair in CLI order — the estimator's
    # phase-sharing premise.  Enforce strict alternation rather than zipping
    # the per-level lists: with a dropped leg file, positional zip would
    # silently ratio walls from different cycles/phases (r4 review)
    for i in range(0, len(ordered) - 1, 2):
        a, b = ordered[i], ordered[i + 1]
        if a["cores"] != lo or b["cores"] != hi:
            raise SystemExit(
                f"leg files must alternate lo,hi,lo,hi — position {i} is "
                f"({a['_path']}: local[{a['cores']}], {b['_path']}: "
                f"local[{b['cores']}]); drop BOTH legs of an incomplete cycle"
            )
    if len(ordered) % 2:
        raise SystemExit(
            f"odd leg count ({len(ordered)}): {ordered[-1]['_path']} has no "
            "cycle mate — drop it or supply its pair"
        )
    cycles = [
        round((ordered[i]["wall_s"] / ordered[i + 1]["wall_s"]) / (hi / lo), 3)
        for i in range(0, len(ordered) - 1, 2)
    ]
    if cycles:
        pair["paired_cycles"] = cycles
        best = paired_best(cycles)
        if best is not None:
            pair["paired_best"] = best
    if f"local[{lo}]" in legs and f"local[{hi}]" in legs:
        pair["efficiency"] = round(
            legs[f"local[{lo}]"]["wall_s"]
            / ((hi / lo) * legs[f"local[{hi}]"]["wall_s"]), 3
        )
        pair["kernel_efficiency"] = round(
            legs[f"local[{lo}]"]["kernel_s"]
            / ((hi / lo) * legs[f"local[{hi}]"]["kernel_s"]), 3
        )

    # session scheme: "pipeline" carries the primary (xl4) corpus; a leg
    # session for another corpus rides under its prefixed key
    out: dict = {"merged_sessions": 1, "primary_corpus": "xl4"}
    if corpus_name == "xl4":
        out["pipeline"] = legs
        out["scaling_pairs"] = {label: pair}
    elif corpus_name == "std":
        out["pipeline_std"] = legs
        out["scaling_pairs_std"] = {label: pair}
    else:
        out[f"pipeline_{corpus_name}"] = legs
        out["scaling_pairs"] = {f"{corpus_name}_{label}": pair}
    return out


def main() -> None:
    if len(sys.argv) < 7:
        raise SystemExit(__doc__)
    dst, corpus_name = sys.argv[1], sys.argv[2]
    lo, hi = int(sys.argv[3]), int(sys.argv[4])
    session = assemble(corpus_name, lo, hi, sys.argv[5:])
    with open(dst, "w") as f:
        json.dump(session, f, indent=1)
    print(f"assembled {len(sys.argv) - 5} legs -> {dst}")


if __name__ == "__main__":
    main()
