"""Host-calibrated before/after bench comparison.

Usage: python tools/calibrated_compare.py <before.json> <after.json>
       [--stat=queries|queries_min] [--touched=q1,q2,...]

The sandbox host's speed drifts 1.5-3x between runs (see NOTES.md
round-10 host-noise dossier), so raw cross-run deltas conflate code and
host. This reads the host factor out of the run itself: rows NO round-10
commit touched (pure TPC-H/idx/text/corpus batch rows) moved only with
the host, so the median after/before ratio over that calibration set IS
the host factor. Touched rows are then reported raw and host-normalized.
"""

from __future__ import annotations

import json
import statistics
import sys

# rows materially changed by a round-10 optimization commit
TOUCHED = {
    "catalog_describe",            # one-scan filelist counts (8181932)
    "dedup_cluster", "corpus_cluster_split",        # star_edges + CC
    "dedup_fuzzy_keepset", "emb_semantic_dedup",    # CC fold + fusion
    "streaming_latest", "streaming_window",         # state sizing, max_by
    "streaming_url_dedup", "streaming_url_dedup_indexed",  # survivor cache
    "streaming_quality_gate", "streaming_domain_quota",    # schema memo
    "streaming_drift",                                     # schema memo
    "link_fuzzy_indexed", "link_fuzzy_join",  # refresh gating, fixtures
    "dedup_incremental_indexed",              # store-index steady state
    "dedup_incremental", "dedup_substring_inc",  # update() fixed overhead
    "sim_ann_ivf_pq", "emb_ann_pq",           # shortlist persist release
}


def main() -> None:
    # --stat queries_min reproduces the min-stat tables published in
    # OPTIMIZATION_r10.md (r10 advice: the tool hard-coded medians)
    args = [
        a
        for a in sys.argv[1:]
        if not a.startswith(("--stat", "--touched"))
    ]
    stat = "queries"
    touched_set = TOUCHED
    for a in sys.argv[1:]:
        if a.startswith("--stat="):
            stat = a.split("=", 1)[1]
        elif a.startswith("--touched="):
            # CSV override for rounds after r10 (the module constant
            # is the r10 set)
            touched_set = set(a.split("=", 1)[1].split(","))
    before = json.load(open(args[0]))[stat]
    after = json.load(open(args[1]))[stat]
    common = set(before) & set(after)
    calib = sorted(common - touched_set)
    ratios = [after[k] / before[k] for k in calib if before[k] >= 0.05]
    host = statistics.median(ratios)
    print(f"calibration set: {len(calib)} untouched rows, "
          f"median after/before ratio (host factor) = {host:.3f} "
          f"(p25={sorted(ratios)[len(ratios)//4]:.3f}, "
          f"p75={sorted(ratios)[3*len(ratios)//4]:.3f})")
    print(f"\n{'touched query':40s} {'before':>7s} {'after':>7s} "
          f"{'raw':>6s} {'normed':>7s}")
    # same >=0.05 floor as the calibration set (r10 advice: a
    # near-zero before row would blow up the ratio or divide by zero)
    touched = [k for k in touched_set & common if before[k] >= 0.05]
    for k in sorted(touched, key=lambda k: after[k] / before[k]):
        r = after[k] / before[k]
        print(f"{k:40s} {before[k]:7.2f} {after[k]:7.2f} "
              f"{r:6.2f}x {r / host:6.2f}x")
    tb = sum(before[k] for k in touched_set & common)
    ta = sum(after[k] for k in touched_set & common)
    print(f"\ntouched sum: {tb:.1f} -> {ta:.1f} raw "
          f"({ta/tb:.3f}x), host-normalized {ta/tb/host:.3f}x")
    ub = sum(before[k] for k in calib)
    ua = sum(after[k] for k in calib)
    print(f"untouched sum: {ub:.1f} -> {ua:.1f} ({ua/ub:.3f}x)")


if __name__ == "__main__":
    main()
