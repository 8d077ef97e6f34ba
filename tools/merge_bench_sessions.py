"""Merge bench session-result JSONs (the dict bench.py main() prints) into
one cross-session result, then refresh BENCH.md from it.

Why: this host shows phase-like throttling where identical legs vary 2-10x
ACROSS sessions, not just across runs — one session can spend its entire
budget inside a throttled phase (its kernel host-probe never approaches the
cross-session best).  The minima-estimates-capability protocol therefore
merges run lists across sessions: per leg, walls and kernel walls concatenate
and the minima recompute; per pair, within-session paired cycles concatenate
(a cycle never mixes sessions, so it still shares one throttle phase).

Honesty note: sessions may span code versions.  Performance changes land
monotonic improvements (measured in PLANS.md before landing), so a minimum
taken from an OLDER session's cleaner phase understates, never overstates,
the current code's capability.

Usage:
  python tools/merge_bench_sessions.py merged.json prior.json new.json [...]
  python bench.py --refresh-md merged.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import paired_best  # noqa: E402


def _merge_leg(a: dict, b: dict) -> dict:
    # explicit raises, not asserts: these are the file's core identity
    # guards (refusing cross-corpus / cross-kernel-slice merges) and must
    # survive python -O (r4 review)
    if a["cores"] != b["cores"]:
        raise SystemExit(
            f"core-count mismatch: local[{a['cores']}] vs local[{b['cores']}]"
        )
    if a["n_turns"] != b["n_turns"]:
        raise SystemExit(
            f"legs ran different corpora at local[{a['cores']}]: "
            f"{a['n_turns']} vs {b['n_turns']} turns — pre/post primary-"
            "promotion sessions must not merge"
        )
    if a.get("kernel_n_turns") != b.get("kernel_n_turns"):
        raise SystemExit(
            f"kernel reference slices differ at local[{a['cores']}]: "
            f"{a.get('kernel_n_turns')} vs {b.get('kernel_n_turns')} turns — "
            "kernel minima would mix different workloads"
        )
    out = dict(a)
    out["all_runs_s"] = a["all_runs_s"] + b["all_runs_s"]
    out["kernel_all_runs_s"] = a["kernel_all_runs_s"] + b["kernel_all_runs_s"]
    out["wall_s"] = min(out["all_runs_s"])
    out["kernel_s"] = min(out["kernel_all_runs_s"])
    out["turns_per_sec"] = round(a["n_turns"] / out["wall_s"], 1)
    out["kernel_turns_per_sec"] = round(
        a["kernel_n_turns"] / out["kernel_s"], 1
    )
    out["errors"] = sorted(set(a["errors"]) | set(b["errors"]))
    # per-run labels (r5+): a side predating them gets "legacy" per run so
    # the lists stay parallel and _age_uncaptured can tell eras apart
    out["errors_per_run"] = (
        a.get("errors_per_run", ["legacy"] * len(a["all_runs_s"]))
        + b.get("errors_per_run", ["legacy"] * len(b["all_runs_s"]))
    )
    if a.get("n_clusters") != b.get("n_clusters"):
        raise SystemExit(
            f"cluster-count mismatch at local[{a['cores']}]: "
            f"{a.get('n_clusters')} vs {b.get('n_clusters')}"
        )
    return out


def _merge_pairs(a: dict, b: dict) -> dict:
    out = dict(a)
    for label, pb in b.items():
        if label not in out:
            out[label] = pb
            continue
        pa = out[label]
        cycles = pa.get("paired_cycles", []) + pb.get("paired_cycles", [])
        out[label] = dict(pa)
        if cycles:
            out[label]["paired_cycles"] = cycles
    # recompute paired_best for EVERY label, one-sided included: a label
    # present in only one session may carry a legacy best computed before
    # the PHASE_FLIP_TOL exclusion and must not republish a super-unity
    # cycle as the capability claim (r4 review)
    for label, p in out.items():
        cycles = p.get("paired_cycles", [])
        if cycles:
            best = paired_best(cycles)
            if best is not None:
                out[label] = dict(p, paired_best=best)
            else:
                out[label] = {
                    k: v for k, v in p.items() if k != "paired_best"
                }
    return out


PIPE_KEYS = ["pipeline", "pipeline_xl", "pipeline_xl4", "pipeline_std"]

AGE_K = int(os.environ.get("SPARK_GRAFT_AGE_K", "6"))


def _age_uncaptured(leg: dict, k: int = AGE_K) -> dict:
    """Age pre-forensics runs out of a leg (VERDICT r4 #8).

    A leg whose errors include "uncaptured" mixes runs from before stderr
    capture with captured ones, and the merged wall lists cannot attribute
    individual runs to either era — so its "none" reads as a label, not a
    guarantee.  Once the leg holds >= k runs carrying PER-RUN labels
    (recorded from r5 on), the unlabeled legacy block — which contains the
    uncaptured runs — is dropped wholesale and the stats recomputed; the
    errors column then states exactly what every surviving run's captured
    stderr classified.  Until then the honest mixed label stays."""
    if "uncaptured" not in leg.get("errors", []):
        return leg
    labels = leg.get("errors_per_run")
    if not labels or len(labels) != len(leg["all_runs_s"]):
        return leg
    keep = [i for i, lab in enumerate(labels) if lab != "legacy"]
    if len(keep) < k:
        return leg
    out = dict(leg)
    out["all_runs_s"] = [leg["all_runs_s"][i] for i in keep]
    out["kernel_all_runs_s"] = [leg["kernel_all_runs_s"][i] for i in keep]
    out["errors_per_run"] = [labels[i] for i in keep]
    out["wall_s"] = min(out["all_runs_s"])
    out["kernel_s"] = min(out["kernel_all_runs_s"])
    out["turns_per_sec"] = round(leg["n_turns"] / out["wall_s"], 1)
    out["kernel_turns_per_sec"] = round(
        leg["kernel_n_turns"] / out["kernel_s"], 1
    )
    out["errors"] = sorted(set(out["errors_per_run"]))
    out["aged_out_runs"] = len(labels) - len(keep)
    return out

# NOTE: "pipeline" means the PRIMARY corpus of the session scheme — the 2x
# corpus before the r4-late primary promotion, the 4x corpus after
# (result["primary_corpus"] == "xl4").  Never merge sessions across that
# boundary: the n_turns assert below refuses it.


def merge(sessions: list[dict]) -> dict:
    out = dict(sessions[0])
    for nxt in sessions[1:]:
        # scheme guard: the n_turns check in _merge_leg only fires on
        # OVERLAPPING core levels — disjoint levels from different corpora
        # would silently co-mingle under one pipeline key (r4 review), so
        # refuse mismatched schemes and representative corpus sizes up front
        pa, pb = out.get("primary_corpus"), nxt.get("primary_corpus")
        if pa and pb and pa != pb:
            raise SystemExit(
                f"session schemes differ: primary_corpus {pa} vs {pb} — "
                "pre/post primary-promotion (or xl-fallback) sessions must "
                "not merge"
            )
        # scaling legs
        for key in PIPE_KEYS:
            legs_a, legs_b = out.get(key) or {}, nxt.get(key) or {}
            na = {leg["n_turns"] for leg in legs_a.values()}
            nb = {leg["n_turns"] for leg in legs_b.values()}
            if na and nb and na != nb:
                raise SystemExit(
                    f"{key}: sessions ran different corpora "
                    f"({sorted(na)} vs {sorted(nb)} turns) — refusing to "
                    "co-mingle legs even on disjoint core levels"
                )
            merged = dict(legs_a)
            for lvl, leg in legs_b.items():
                merged[lvl] = (
                    _merge_leg(legs_a[lvl], leg) if lvl in legs_a else leg
                )
            if merged:
                out[key] = merged
        out["scaling_pairs"] = _merge_pairs(
            out.get("scaling_pairs", {}), nxt.get("scaling_pairs", {})
        )
        out["scaling_pairs_std"] = _merge_pairs(
            out.get("scaling_pairs_std", {}), nxt.get("scaling_pairs_std", {})
        )
        # headline queries
        runs = dict(out.get("query_all_runs", {}))
        for q, ts in nxt.get("query_all_runs", {}).items():
            runs[q] = runs.get(q, []) + ts
        out["query_all_runs"] = runs
        out["queries"] = {q: min(ts) for q, ts in runs.items() if ts}
        out["value"] = round(sum(out["queries"].values()), 2)
        out["headline_errors"] = out.get("headline_errors", []) + nxt.get(
            "headline_errors", []
        )

    # age pre-forensics runs out of mixed legs BEFORE recomputing the
    # minima-derived stats below (VERDICT r4 #8)
    for key in PIPE_KEYS:
        if out.get(key):
            out[key] = {
                lvl: _age_uncaptured(leg) for lvl, leg in out[key].items()
            }

    # recompute pair efficiencies from the merged minima
    def _eff(pairs: dict, legs: dict, prefix: str = "") -> None:
        for label, p in pairs.items():
            kind_lo_hi = label[len(prefix):] if label.startswith(prefix) else label
            parts = kind_lo_hi.split("_")
            if len(parts) != 3:
                continue
            lo, hi = f"local[{parts[1]}]", f"local[{parts[2]}]"
            if lo not in legs or hi not in legs:
                continue
            ratio = int(parts[2]) / int(parts[1])
            p["efficiency"] = round(
                legs[lo]["wall_s"] / (ratio * legs[hi]["wall_s"]), 3
            )
            p["kernel_efficiency"] = round(
                legs[lo]["kernel_s"] / (ratio * legs[hi]["kernel_s"]), 3
            )

    pairs = out.get("scaling_pairs", {})
    _eff({k: v for k, v in pairs.items()
          if not k.startswith(("xl4_", "xl_"))}, out.get("pipeline") or {})
    # secondary-corpus pairs: "xl4_" prefix in the pre-promotion scheme
    # (2x primary), "xl_" prefix after (4x primary)
    _eff({k: v for k, v in pairs.items() if k.startswith("xl4_")},
         out.get("pipeline_xl4") or {}, prefix="xl4_")
    _eff({k: v for k, v in pairs.items() if k.startswith("xl_")},
         out.get("pipeline_xl") or {}, prefix="xl_")
    _eff(out.get("scaling_pairs_std", {}), out.get("pipeline_std") or {})

    # recompute cross-corpus phase quality (kernel slice is the constant
    # host probe; best-by-level spans every corpus at that core count)
    best_by_level: dict[str, float] = {}
    for key in PIPE_KEYS:
        for lvl, leg in (out.get(key) or {}).items():
            k = min(leg["kernel_all_runs_s"])
            best_by_level[lvl] = min(best_by_level.get(lvl, k), k)
    for key in PIPE_KEYS:
        for lvl, leg in (out.get(key) or {}).items():
            leg["phase_quality"] = round(
                best_by_level[lvl] / min(leg["kernel_all_runs_s"]), 2
            )

    lin = pairs.get("linear_1_4", {})
    out["scaling_efficiency"] = lin.get("efficiency")
    out["scaling_efficiency_paired_best"] = lin.get("paired_best")
    out["kernel_scaling_efficiency"] = lin.get("kernel_efficiency")
    prim = out.get("pipeline") or {}
    if prim:
        # best across legs, not highest-core: local[32] is slower than
        # local[8] on this VM, and the metric is throughput
        best = max(prim, key=lambda s: prim[s]["turns_per_sec"])
        out["throughput_turns_per_sec"] = prim[best]["turns_per_sec"]
        out["throughput_level"] = best
    out["merged_sessions"] = sum(
        s.get("merged_sessions", 1) for s in sessions
    )
    return out


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    dst, srcs = sys.argv[1], sys.argv[2:]
    sessions = [json.load(open(p)) for p in srcs]
    merged = merge(sessions)
    with open(dst, "w") as f:
        json.dump(merged, f, indent=1)
    lin = merged.get("scaling_pairs", {}).get("linear_1_4", {})
    print(
        f"merged {len(sessions)} sessions -> {dst}: headline {merged['value']}s, "
        f"linear_1_4 e2e {lin.get('efficiency')} kernel "
        f"{lin.get('kernel_efficiency')} paired_best {lin.get('paired_best')}"
    )


if __name__ == "__main__":
    main()
