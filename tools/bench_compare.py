#!/usr/bin/env python
"""Compare two BENCH_DETAIL.json files with calibration normalization.

Usage:
    python tools/bench_compare.py OLD NEW [--min] [--threshold 1.3]
                                  [--base THIRD]

OLD/NEW/THIRD are file paths or git revision specs (``HEAD:BENCH_DETAIL
.json``, ``9dcb4f8:BENCH_r17.json``) — anything containing ``:`` that is
not an existing file is read via ``git show``, so the committed record
vs the working tree is one command (VERDICT r17 #8):

    python tools/bench_compare.py HEAD:BENCH_DETAIL.json BENCH_DETAIL.json

Each query's time is divided by its run's ``calibration_sec`` (the
machine-speed probe bench.py measures at session start), so cross-run /
cross-machine comparisons see plan changes, not host variance. Prints
common-subset totals, per-query regressions above the threshold, and a
two-sided mover summary: same-code ambient noise scatters movers in BOTH
directions with disjoint membership run-to-run, while a real regression
is one-sided. With ``--base`` (e.g. the previous round's committed
record) it additionally prints each side's regression set vs the base
and their overlap — the disjoint-slow-sets test that separated ambient
load from regression in the r17 driver-vs-builder divergence.
NB: calibration itself has JIT/thermal noise (observed 0.97..1.7 on one
box minutes apart) — treat <1.5x normalized deltas as noise unless they
reproduce in a dedicated re-time (see memory: rotation-and-bench-
discipline).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess


def _load(spec: str) -> dict:
    if ":" in spec and not os.path.exists(spec):
        out = subprocess.run(
            ["git", "show", spec],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    with open(spec) as fh:
        return json.load(fh)


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    return (xs[len(xs) // 2] + xs[(len(xs) - 1) // 2]) / 2


def _regs(qa, qb, ca, cb, common, threshold, floor=0.3):
    """Queries where NEW (b) is slower than OLD (a) calibrated, above
    threshold and the absolute-seconds floor."""
    out = []
    for q in common:
        if not qa[q]:
            # caller's `common` filters its own old side; when called
            # with swapped args the denominator side must be re-checked
            # (a 0.0 entry would raise ZeroDivisionError below)
            continue
        na, nb = qa[q] / ca, qb[q] / cb
        if nb > na * threshold and qb[q] > floor:
            out.append((nb / na, q, qa[q], qb[q]))
    return sorted(out, reverse=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min", action="store_true", help="compare queries_min")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument(
        "--base",
        default=None,
        help="third record (file or git spec); prints OLD-vs-base and "
        "NEW-vs-base regression sets and their overlap (disjoint sets "
        "across same-code runs = ambient, overlapping = real)",
    )
    args = ap.parse_args()
    key = "queries_min" if args.min else "queries"
    a, b = _load(args.old), _load(args.new)
    ca, cb = a.get("calibration_sec") or 1.0, b.get("calibration_sec") or 1.0
    qa, qb = a[key], b[key]
    common = sorted(q for q in set(qa) & set(qb) if qa[q])
    if not common:
        # guards both the totals division and the median of an empty
        # ratio list (ADVICE r17 #3)
        print(
            f"no comparable queries: |old|={len(qa)} |new|={len(qb)} "
            f"share {len(set(qa) & set(qb))} names, none with nonzero "
            "old-side time"
        )
        return 2
    sa = sum(qa[q] for q in common)
    sb = sum(qb[q] for q in common)
    print(
        f"common {len(common)} queries | raw {sa:.1f}s -> {sb:.1f}s"
        f" | cal {ca:.2f} -> {cb:.2f}"
        f" | normalized {sa / ca:.1f} -> {sb / cb:.1f}"
        f" ({(sb / cb) / (sa / ca):.2f}x)"
    )
    # r17 calibration protocol (SCALE.md "Calibration protocol"): print
    # BOTH per-query ratio medians side by side, each with its run's
    # ambient flag. When either side's probe was ambient-suspect, the
    # calibrated median is a probe artifact — judge round-over-round on
    # the RAW median (the r15->r16 1.17x calibrated median was pure probe
    # artifact over a flat 1.03x raw).
    raw_med = _median([qb[q] / qa[q] for q in common])
    cal_med = _median([(qb[q] / cb) / (qa[q] / ca) for q in common])
    fa = "AMBIENT-SUSPECT" if a.get("ambient_suspect") else "clean"
    fb = "AMBIENT-SUSPECT" if b.get("ambient_suspect") else "clean"
    print(
        f"per-query median ratio | raw {raw_med:.2f}x | calibrated "
        f"{cal_med:.2f}x | probes: old={fa} "
        f"(iqr/med {a.get('probe_iqr_over_median', '?')}), new={fb} "
        f"(iqr/med {b.get('probe_iqr_over_median', '?')})"
    )
    if a.get("ambient_suspect") or b.get("ambient_suspect"):
        print(
            "  NOTE: an ambient-suspect probe deflates/inflates calibrated"
            " figures — trust the RAW median this comparison"
        )
    regs = _regs(qa, qb, ca, cb, common, args.threshold)
    for ratio, q, va, vb in regs:
        print(f"  REG {ratio:5.2f}x  {q}: {va:.2f}s -> {vb:.2f}s (raw)")
    if not regs:
        print("  no normalized regressions above threshold")
    # Two-sided mover summary: ambient noise scatters movers BOTH ways;
    # a real regression is one-sided.
    fwd = {q for _, q, _, _ in regs}
    rev = {q for _, q, _, _ in _regs(qb, qa, cb, ca, common, args.threshold)}
    print(
        f"movers >{args.threshold}x: {len(fwd)} slower in NEW, "
        f"{len(rev)} slower in OLD -> "
        + (
            "two-sided scatter (ambient-shaped)"
            if fwd and rev and len(fwd) <= 2 * len(rev) and len(rev) <= 2 * len(fwd)
            else ("quiet" if not fwd and not rev else "one-sided (investigate)")
        )
    )
    if args.base:
        base = _load(args.base)
        cz = base.get("calibration_sec") or 1.0
        qz = base[key]
        za = {
            q
            for _, q, _, _ in _regs(
                qz, qa, cz, ca, sorted(q for q in set(qz) & set(qa) if qz[q]), args.threshold
            )
        }
        zb = {
            q
            for _, q, _, _ in _regs(
                qz, qb, cz, cb, sorted(q for q in set(qz) & set(qb) if qz[q]), args.threshold
            )
        }
        inter = sorted(za & zb)
        print(
            f"vs base: OLD slow-set {len(za)}, NEW slow-set {len(zb)}, "
            f"overlap {len(inter)} -> "
            + (
                "DISJOINT (ambient-shaped)"
                if not inter
                else f"overlapping (re-time these): {inter}"
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
