#!/usr/bin/env python
"""Derive (and optionally apply) the next round's attestation window.

Every round until r18 the 50-name ``_PRIORITY`` rotation was rebuilt
with an ad-hoc inline script; this tool makes the ritual deterministic
and repeatable:

    python tools/rotate_window.py            # print the plan
    python tools/rotate_window.py --apply    # rewrite harness/__init__.py

Slot assignment, in priority order (matching the saturation arithmetic
in SCALE.md "Round-18"):
  1. never-attested registrations (a new query outside the window is a
     hard rotation_audit failure),
  2. deferral-mandated names (``tools/rotation_deferrals.json`` entries
     whose ``must_attest_by`` == the next round),
  3. the due cohort — queries whose latest attestation hits the 6-round
     freshness horizon next round,
  4. remaining slots oldest-attestation-first (deferred names that CAN
     come early do, before clean stale ones of the same age).

``--apply`` rewrites the ``_PRIORITY`` and ``_KEEP`` lists in
harness/__init__.py, preserving each list's leading comment block
(everything before the first name) and regenerating the name lines.
After applying, run ``python tools/rotation_audit.py`` and the harness
pin tests — this tool does not replace either check.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_audit():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "rotation_audit", os.path.join(REPO, "tools", "rotation_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


HORIZON = 6
INIT_PATH = os.path.join(
    REPO, "lakehouse_platform_nyc_taxi_spark", "harness", "__init__.py"
)


def plan(window_size: int = 50):
    audit = _load_audit()
    from lakehouse_platform_nyc_taxi_spark import harness

    order = list(harness.registry())
    latest = audit.latest_attestation()
    boundaries = audit.round_boundary_commits()
    # Run this at the START of a round, once the previous round's
    # CORRECTNESS_r*.json is checked in: the round being planned is the
    # one after the newest boundary commit.
    next_round = max(boundaries) + 1
    deferrals = audit.load_deferrals()

    never = [n for n in order if n not in latest]
    # <= not ==: an expired deferral (its round was missed) must still be
    # forced into the next window, or rotation_audit fails every round
    # while this planner keeps emitting windows without the fix
    mandated = [
        n
        for n in order
        if n not in never
        and n in deferrals
        and deferrals[n].get("must_attest_by", 0) <= next_round
    ]
    due = [
        n
        for n in order
        if n not in never
        and n not in mandated
        and latest[n] <= next_round - HORIZON
    ]
    window: list[str] = never + mandated + due
    if len(window) > window_size:
        return window, [], (
            f"OVERFULL: {len(window)} forced names for {window_size} slots "
            f"(never={len(never)} deferral-mandated={len(mandated)} "
            f"due={len(due)}) — retire queries or split the cohort"
        )
    # Fill remaining slots oldest-first; among equal ages, deferred
    # names (they carry verified drift) outrank clean stale ones.
    rest = [n for n in order if n not in set(window)]
    rest.sort(key=lambda n: (latest[n], n not in deferrals, order.index(n)))
    fill = rest[: window_size - len(window)]
    window += fill
    keep = [n for n in rest if n not in set(fill)]
    note = (
        f"next round r{next_round}: window = {len(never)} new + "
        f"{len(mandated)} deferral-mandated + {len(due)} due cohort + "
        f"{len(fill)} oldest-first fill; keep = {len(keep)} staleness-ordered"
    )
    return window, keep, note


def _rewrite_list(src: str, name: str, names: list[str]) -> str:
    """Replace the name lines of ``name = [...]`` keeping the leading
    comment block (lines before the first quoted name)."""
    m = re.search(rf"^{name} = \[\n(.*?)^\]$", src, re.M | re.S)
    if not m:
        raise SystemExit(f"could not locate {name} list")
    body = m.group(1)
    head_lines = []
    for line in body.splitlines():
        if re.match(r'\s*"', line):
            break
        head_lines.append(line)
    head = ("\n".join(head_lines) + "\n") if head_lines else ""
    new_body = head + "".join(f'    "{n}",\n' for n in names)
    return src[: m.start()] + f"{name} = [\n{new_body}]" + src[m.end() :]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()
    window, keep, note = plan(args.window)
    print(note)
    if not keep and len(window) > args.window:
        for n in window:
            print(f"  forced: {n}")
        return 1
    print("\nwindow:")
    for n in window:
        print(f"  {n}")
    if args.apply:
        with open(INIT_PATH) as fh:
            src = fh.read()
        src = _rewrite_list(src, "_PRIORITY", window)
        src = _rewrite_list(src, "_KEEP", keep)
        with open(INIT_PATH, "w") as fh:
            fh.write(src)
        print(f"\napplied to {os.path.relpath(INIT_PATH, REPO)}")
        # The slot assignment above knows nothing about BODY-changed
        # queries (detecting them needs the audit's boundary
        # fingerprinting); running the audit immediately surfaces any
        # such query left outside the window, so --apply cannot
        # silently produce a failing ritual. Pin tests still apply.
        import subprocess

        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "rotation_audit.py")],
            cwd=REPO,
        )
        if res.returncode != 0:
            print(
                "rotation_audit FAILED on the applied window — a "
                "body-changed (or undeferred helper-changed) query needs "
                "a hand-assigned slot; see the flags above"
            )
            return res.returncode
        print("rotation_audit passed on the applied window")
    return 0


if __name__ == "__main__":
    sys.exit(main())
