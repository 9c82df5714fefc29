"""Code-diff-aware rotation audit (VERDICT r15 #2).

The 50-slot `_PRIORITY` rotation ranks queries by attestation age, but age
alone missed a category: a query whose IMPLEMENTATION changed after its
last green driver-oracle row (e.g. `agg_weighted_median`'s r12 rewrite sat
unattested for three rounds). This script makes the rotation
code-diff-aware:

For every registry query it
  1. finds the round of its latest green row across CORRECTNESS_r*.json,
  2. resolves that round's boundary commit (`round N: verdict/...` —
     the tree the driver attested),
  3. extracts the decorated registry function's AST from that commit's
     copy of the module (docstrings stripped, comments/whitespace ignored;
     the @register decorator is included, so inline oracle-SQL edits flag
     too), and
  4. compares it against the working tree.

Any query whose body differs from its last-attested form MUST sit inside
the driver's 50-query window (the head of the registration order). The
script exits non-zero otherwise — run it in the round ritual after
editing `_PRIORITY`.

Known limitation (documented, deliberate): module-level helpers and
oracle-SQL builder functions are compared as call sites, not values; a
behavior change hidden entirely inside a shared helper will not flag the
callers. The per-module change list printed at the end is the
informational net under that gap.

Usage:
    python tools/rotation_audit.py [--window N]
"""

from __future__ import annotations

import argparse
import ast
import copy
import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def round_boundary_commits() -> dict[int, str]:
    """round number -> commit hash of that round's attestation boundary."""
    out = {}
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict/advice/correctness/bench", subject)
        if m:
            # git log is newest-first; keep the newest commit per round
            out.setdefault(int(m.group(1)), sha)
    return out


def latest_attestation() -> dict[str, int]:
    """query name -> latest round with a green (hash/rows-only) row."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("err") is None and row.get("rows_match", True):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


class _StripDocstrings(ast.NodeTransformer):
    def _strip(self, node):
        if (
            node.body
            and isinstance(node.body[0], ast.Expr)
            and isinstance(node.body[0].value, ast.Constant)
            and isinstance(node.body[0].value.value, str)
        ):
            node.body = node.body[1:] or [ast.Pass()]
        return node

    def visit_FunctionDef(self, node):
        self.generic_visit(node)
        return self._strip(node)

    visit_AsyncFunctionDef = visit_FunctionDef


def fn_fingerprint(module_src: str, fn_name: str) -> str | None:
    """Docstring-free AST dump of a top-level function (decorators
    included), or None if the module has no such function."""
    try:
        tree = ast.parse(module_src)
    except SyntaxError:
        return None
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name == fn_name:
            clean = _StripDocstrings().visit(copy.deepcopy(node))
            # the register(...) decorator's doc= kwarg is display-only —
            # a doc edit is not a semantic change
            for dec in clean.decorator_list:
                if isinstance(dec, ast.Call):
                    dec.keywords = [k for k in dec.keywords if k.arg != "doc"]
            return ast.dump(clean)
    return None


class _TreeSearch:
    """Find a top-level function's fingerprint anywhere in the package at
    a given commit — registry functions move between modules in refactor
    rounds, and a pure move is not a semantic change."""

    def __init__(self):
        self._files: dict[str, list[str]] = {}
        self._src: dict[tuple[str, str], str | None] = {}

    def _ls(self, sha: str) -> list[str]:
        if sha not in self._files:
            out = _git(
                "ls-tree", "-r", "--name-only", sha, "--",
                "lakehouse_platform_nyc_taxi_spark",
            )
            # one path per line: split() would break paths containing
            # whitespace and silently mis-list them (ADVICE r16)
            self._files[sha] = [
                p for p in out.splitlines() if p.endswith(".py")
            ]
        return self._files[sha]

    def src(self, sha: str, path: str) -> str | None:
        key = (sha, path)
        if key not in self._src:
            try:
                self._src[key] = _git("show", f"{sha}:{path}")
            except subprocess.CalledProcessError:
                self._src[key] = None
        return self._src[key]

    def find(self, sha: str, path_hint: str, fn_name: str) -> str | None:
        hinted = self.src(sha, path_hint)
        if hinted is not None:
            fp = fn_fingerprint(hinted, fn_name)
            if fp is not None:
                return fp
        for path in self._ls(sha):
            if path == path_hint:
                continue
            src = self.src(sha, path)
            if src is None:
                continue
            fp = fn_fingerprint(src, fn_name)
            if fp is not None:
                return fp
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50, help="driver window size")
    args = ap.parse_args()

    from lakehouse_platform_nyc_taxi_spark import harness

    reg = harness.registry()
    order = list(reg)
    window = set(order[: args.window])
    boundaries = round_boundary_commits()
    attested = latest_attestation()

    current_src: dict[str, str] = {}
    tree = _TreeSearch()
    changed: list[tuple[str, int, str]] = []
    never = [n for n in order if n not in attested]

    for name, spec in reg.items():
        rnd = attested.get(name)
        if rnd is None:
            continue
        if rnd not in boundaries:
            changed.append((name, rnd, "no boundary commit for attestation round"))
            continue
        sha = boundaries[rnd]
        path = os.path.relpath(inspect.getsourcefile(spec.fn), REPO)
        if path not in current_src:
            with open(os.path.join(REPO, path)) as fh:
                current_src[path] = fh.read()
        now_fp = fn_fingerprint(current_src[path], spec.fn.__name__)
        old_fp = tree.find(sha, path, spec.fn.__name__)
        if old_fp is None:
            changed.append((name, rnd, f"function absent at r{rnd} boundary"))
        elif now_fp != old_fp:
            changed.append((name, rnd, f"body differs from r{rnd} boundary ({path})"))

    print(f"registry: {len(order)} queries; window: first {args.window}")
    print(f"never-attested: {len(never)}" + (f" -> {never}" if never else ""))
    ok = True
    if changed:
        print(f"\nchanged since last attestation ({len(changed)}):")
        for name, rnd, why in sorted(changed):
            in_win = name in window
            mark = "in-window" if in_win else "** OUTSIDE WINDOW **"
            print(f"  {name} (last green r{rnd}): {why} [{mark}]")
            if not in_win:
                ok = False
    else:
        print("\nno query body changed since its last attestation")
    missing_win = [n for n in never if n not in window]
    if missing_win:
        print(f"\n** never-attested queries outside the window: {missing_win}")
        ok = False

    # Informational: which registry modules changed since the newest boundary.
    newest = boundaries[max(boundaries)]
    mod_files = sorted({os.path.relpath(inspect.getsourcefile(s.fn), REPO) for s in reg.values()})
    diff = [
        p
        for p in _git("diff", "--name-only", newest, "--", *mod_files).splitlines()
        if p
    ]
    print(f"\nregistry modules changed since r{max(boundaries)} boundary: {diff or 'none'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
