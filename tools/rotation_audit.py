"""Code-diff-aware rotation audit (VERDICT r15 #2; helper closure r17 #3).

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
  4. compares it against the working tree,
  5. (r18, VERDICT r17 #3) resolves the function's TRANSITIVE HELPER
     CLOSURE — same-module top-level helpers, symbols pulled in via
     relative imports, attribute calls through module aliases, and
     re-export chains through package ``__init__`` files — fingerprints
     every closure symbol at the attestation boundary, and flags the
     query when any helper's AST differs from the working tree. This
     closes the r17 blind spot where `operators/multimodal.py`'s decode
     seams were rewritten without flagging their five registry consumers.

Any query whose body OR helper closure differs from its last-attested form
MUST sit inside the driver's 50-query window (the head of the registration
order). The script exits non-zero otherwise — run it in the round ritual
after editing `_PRIORITY`.

Helper-changed queries that cannot fit the current window (the window is
saturated at 50 since r17) may carry a deferral in
``tools/rotation_deferrals.json``::

    {"<query>": {"must_attest_by": 19, "reason": "..."}}

A deferral downgrades the hard failure to a warning while
``current_round <= must_attest_by`` (current round = newest boundary + 1);
an expired deferral fails again. Body changes are never deferrable — a
changed body with no window slot is a planning error, not a backlog item.

Retroactive runs: ``--tree <commit>`` fingerprints the "now" side from
that commit instead of the working tree (attestation data still comes
from the checked-out CORRECTNESS_r*.json files, and the window is the
current registry's). ``--no-deferrals`` ignores the deferral file —
use both together to reproduce a historical gap, e.g. the r17 boundary
run, which flags the THREE decode-seam consumers whose helpers truly
changed (not the five the r17 VERDICT's module-level view suspected)
plus four older helper drifts; see SCALE.md "Round-18".

Usage:
    python tools/rotation_audit.py [--window N] [--tree SHA] [--no-deferrals]
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
PKG = "lakehouse_platform_nyc_taxi_spark"
DEFERRALS_PATH = os.path.join(REPO, "tools", "rotation_deferrals.json")
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
    visit_ClassDef = visit_FunctionDef


def _node_fingerprint(node: ast.AST) -> str:
    clean = _StripDocstrings().visit(copy.deepcopy(node))
    # the register(...) decorator's doc= kwarg is display-only —
    # a doc edit is not a semantic change
    for dec in getattr(clean, "decorator_list", []):
        if isinstance(dec, ast.Call):
            dec.keywords = [k for k in dec.keywords if k.arg != "doc"]
    return ast.dump(clean)


def fn_fp_from_index(resolver: "_Resolver", path: str, fn_name: str) -> str | None:
    """Fingerprint of a top-level function via the resolver's cached
    module index (no re-parse; the index already holds the AST node)."""
    idx = resolver.index(path)
    if idx is None:
        return None
    node = idx.symbols.get(fn_name)
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
        return _node_fingerprint(node)
    return None


def fn_fingerprint(module_src: str, fn_name: str) -> str | None:
    """Docstring-free AST dump of a top-level function (decorators
    included), or None if the module has no such function."""
    try:
        tree = ast.parse(module_src)
    except SyntaxError:
        return None
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name == fn_name:
            return _node_fingerprint(node)
    return None


# --------------------------------------------------------------------------
# Source providers: uniform file access for the working tree and for any
# commit, so the helper-closure resolver runs identically on both sides.
# --------------------------------------------------------------------------


class WorkingTree:
    name = "working tree"

    def ls(self) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in files:
                if f.endswith(".py"):
                    out.append(os.path.relpath(os.path.join(root, f), REPO))
        return out

    def src(self, path: str) -> str | None:
        try:
            with open(os.path.join(REPO, path)) as fh:
                return fh.read()
        except OSError:
            return None


class CommitTree:
    def __init__(self, sha: str):
        self.sha = sha
        self.name = f"commit {sha[:10]}"
        self._files: list[str] | None = None
        self._src: dict[str, str | None] = {}

    def ls(self) -> list[str]:
        if self._files is None:
            out = _git("ls-tree", "-r", "--name-only", self.sha, "--", PKG)
            # one path per line: split() would break paths containing
            # whitespace and silently mis-list them (ADVICE r16)
            self._files = [p for p in out.splitlines() if p.endswith(".py")]
        return self._files

    def src(self, path: str) -> str | None:
        if path not in self._src:
            try:
                self._src[path] = _git("show", f"{self.sha}:{path}")
            except subprocess.CalledProcessError:
                self._src[path] = None
        return self._src[path]


class _ModuleIndex:
    """Parsed view of one module: top-level symbols + package-internal
    import map (module-level AND function-local imports both count)."""

    def __init__(self, path: str, src: str):
        self.path = path
        self.tree = ast.parse(src)
        # dotted package of the module itself, e.g. harness/llm.py ->
        # ("lakehouse_platform_nyc_taxi_spark", "harness")
        parts = path[:-3].split("/")
        if parts[-1] == "__init__":
            parts = parts[:-1]
        self._pkg_parts = parts[:-1] if not path.endswith("__init__.py") else parts

        self.symbols: dict[str, ast.AST] = {}
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.symbols[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.symbols[t.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                if node.value is not None:
                    self.symbols[node.target.id] = node

        # local name -> (dotted base module, original name) for
        # `from X import name [as local]`; the resolver decides whether
        # the target is a submodule or a symbol.
        self.from_imports: dict[str, tuple[str, str]] = {}
        # local name -> dotted module for `import pkg.mod [as local]`
        self.module_imports: dict[str, str] = {}
        for node in ast.walk(self.tree):
            if isinstance(node, ast.ImportFrom):
                base = self._resolve_from(node)
                if base is None:
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    self.from_imports[a.asname or a.name] = (base, a.name)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name == PKG or a.name.startswith(PKG + "."):
                        if a.asname:
                            # `import a.b.c as m` binds m -> a.b.c
                            self.module_imports[a.asname] = a.name
                        else:
                            # `import a.b.c` binds only the ROOT name a;
                            # mapping it to the full dotted path would
                            # resolve `a.X` against a/b/c.py instead of
                            # a/__init__.py
                            root = a.name.split(".")[0]
                            self.module_imports[root] = root

    def _resolve_from(self, node: ast.ImportFrom) -> str | None:
        if node.level == 0:
            mod = node.module or ""
            if mod == PKG or mod.startswith(PKG + "."):
                return mod
            return None
        base = self._pkg_parts[: len(self._pkg_parts) - (node.level - 1)]
        if not base or base[0] != PKG:
            return None
        if node.module:
            base = base + node.module.split(".")
        return ".".join(base)


class _Resolver:
    """Resolve (module, name) references to their defining module across
    re-export chains, over any SourceProvider."""

    def __init__(self, provider):
        self.provider = provider
        self._idx: dict[str, _ModuleIndex | None] = {}
        self._fileset: set[str] | None = None

    def _exists(self, path: str) -> bool:
        if self._fileset is None:
            self._fileset = set(self.provider.ls())
        return path in self._fileset

    def module_file(self, dotted: str) -> str | None:
        base = dotted.replace(".", "/")
        if self._exists(base + ".py"):
            return base + ".py"
        if self._exists(base + "/__init__.py"):
            return base + "/__init__.py"
        return None

    def index(self, path: str) -> _ModuleIndex | None:
        if path not in self._idx:
            src = self.provider.src(path)
            try:
                self._idx[path] = _ModuleIndex(path, src) if src is not None else None
            except SyntaxError:
                self._idx[path] = None
        return self._idx[path]

    def resolve_symbol(
        self, path: str, name: str, _seen: set | None = None
    ) -> tuple[str, str] | None:
        """(defining module path, name) for a symbol visible in `path` as
        `name`, following `from X import y` chains; None if it is not a
        package-internal symbol (builtins, third-party, submodule alias)."""
        _seen = _seen or set()
        if (path, name) in _seen:
            return None
        _seen.add((path, name))
        idx = self.index(path)
        if idx is None:
            return None
        if name in idx.symbols:
            return (path, name)
        if name in idx.from_imports:
            base, orig = idx.from_imports[name]
            # `from pkg.sub import mod` where mod is a submodule: the local
            # name is a module alias, not a symbol.
            if self.module_file(base + "." + orig):
                return None
            mfile = self.module_file(base)
            if mfile:
                return self.resolve_symbol(mfile, orig, _seen)
        return None

    def resolve_module_alias(self, path: str, name: str) -> str | None:
        """Module file a local name refers to, if it is a module alias."""
        idx = self.index(path)
        if idx is None:
            return None
        if name in idx.module_imports:
            return self.module_file(idx.module_imports[name])
        if name in idx.from_imports:
            base, orig = idx.from_imports[name]
            return self.module_file(base + "." + orig)
        return None


def _references(node: ast.AST):
    """(kind, ...) references inside a node: bare names and single-level
    attribute access on a name (module-alias calls like `dedup.foo`)."""
    for n in ast.walk(node):
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            yield ("attr", n.value.id, n.attr)
        elif isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
            yield ("name", n.id)


def helper_closure(resolver: _Resolver, path: str, fn_name: str) -> dict[tuple[str, str], str]:
    """Transitive package-internal helper closure of a top-level function:
    {(module path, symbol name): working fingerprint}. The root function
    itself is excluded (the body check covers it)."""
    root_idx = resolver.index(path)
    if root_idx is None or fn_name not in root_idx.symbols:
        return {}
    out: dict[tuple[str, str], str] = {}
    queue: list[tuple[str, str]] = [(path, fn_name)]
    seen: set[tuple[str, str]] = {(path, fn_name)}
    while queue:
        mpath, sname = queue.pop()
        idx = resolver.index(mpath)
        if idx is None or sname not in idx.symbols:
            continue
        node = idx.symbols[sname]
        if (mpath, sname) != (path, fn_name):
            out[(mpath, sname)] = _node_fingerprint(node)
        for ref in _references(node):
            if ref[0] == "name":
                target = resolver.resolve_symbol(mpath, ref[1])
            else:
                _, base, attr = ref
                mfile = resolver.resolve_module_alias(mpath, base)
                target = resolver.resolve_symbol(mfile, attr) if mfile else None
            if target and target not in seen:
                seen.add(target)
                queue.append(target)
    return out


class _BoundaryFingerprints:
    """Symbol fingerprints at a boundary commit, with relocation fallback:
    if the symbol is not at the hinted path, search the whole package (a
    pure move between modules is not a semantic change)."""

    def __init__(self):
        self._resolvers: dict[str, _Resolver] = {}

    def resolver(self, sha: str) -> _Resolver:
        if sha not in self._resolvers:
            self._resolvers[sha] = _Resolver(CommitTree(sha))
        return self._resolvers[sha]

    def lookup(self, sha: str, path_hint: str, name: str) -> str | None:
        res = self.resolver(sha)
        idx = res.index(path_hint)
        if idx is not None and name in idx.symbols:
            return _node_fingerprint(idx.symbols[name])
        for path in res.provider.ls():
            if path == path_hint:
                continue
            idx = res.index(path)
            if idx is not None and name in idx.symbols:
                return _node_fingerprint(idx.symbols[name])
        return None


def load_deferrals() -> dict[str, dict]:
    if not os.path.exists(DEFERRALS_PATH):
        return {}
    with open(DEFERRALS_PATH) as fh:
        data = json.load(fh)
    return {k: v for k, v in data.items() if not k.startswith("_")}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50, help="driver window size")
    ap.add_argument(
        "--tree",
        default=None,
        help="fingerprint the 'now' side from this commit instead of the "
        "working tree (retroactive runs)",
    )
    ap.add_argument(
        "--no-deferrals",
        action="store_true",
        help="ignore tools/rotation_deferrals.json",
    )
    args = ap.parse_args()

    from lakehouse_platform_nyc_taxi_spark import harness

    reg = harness.registry()
    order = list(reg)
    window = set(order[: args.window])
    boundaries = round_boundary_commits()
    attested = latest_attestation()
    current_round = max(boundaries) + 1
    deferrals = {} if args.no_deferrals else load_deferrals()

    now_provider = CommitTree(_git("rev-parse", args.tree).strip()) if args.tree else WorkingTree()
    now_resolver = _Resolver(now_provider)
    boundary_fps = _BoundaryFingerprints()

    changed: list[tuple[str, int, str]] = []
    helper_hits: list[tuple[str, int, list[str]]] = []
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
        now_fp = fn_fp_from_index(now_resolver, path, spec.fn.__name__)
        if now_fp is None:
            # --tree mode: the function may live in a different module at
            # that commit (a pure move is not a semantic change) — search
            # the package, mirroring the boundary side's relocation
            # fallback
            for p in now_resolver.provider.ls():
                fp = fn_fp_from_index(now_resolver, p, spec.fn.__name__)
                if fp is not None:
                    now_fp, path = fp, p
                    break
        old_fp = boundary_fps.lookup(sha, path, spec.fn.__name__)
        if old_fp is None:
            changed.append((name, rnd, f"function absent at r{rnd} boundary"))
            continue
        if now_fp != old_fp:
            changed.append((name, rnd, f"body differs from r{rnd} boundary ({path})"))
            continue  # body flag subsumes helper flags
        # Helper closure: every symbol the (unchanged) body transitively
        # reaches must match what the consumer resolved to AT THE
        # BOUNDARY. Comparing against the boundary-side closure (not a
        # name lookup in the now-side module) closes two holes: an
        # import rebound to a DIFFERENT same-named helper (both
        # individually unchanged) flags as a resolution move, and a
        # same-named symbol in an unrelated module cannot satisfy the
        # lookup by accident. Fingerprint equality still wins — a pure
        # move, or a rebind to a bit-identical implementation, is not a
        # semantic change.
        closure = helper_closure(now_resolver, path, spec.fn.__name__)
        bres = boundary_fps.resolver(sha)
        bpath = path if bres.index(path) is not None else None
        if bpath is None or spec.fn.__name__ not in bres.index(bpath).symbols:
            bpath = next(
                (
                    p
                    for p in bres.provider.ls()
                    if bres.index(p) is not None
                    and spec.fn.__name__ in bres.index(p).symbols
                ),
                None,
            )
        bclosure = helper_closure(bres, bpath, spec.fn.__name__) if bpath else {}
        diffs = []
        for (hpath, hname), now_hfp in sorted(closure.items()):
            old_hfp = bclosure.get((hpath, hname))
            if old_hfp == now_hfp:
                continue
            if old_hfp is not None:
                diffs.append(f"{hpath}::{hname} (changed)")
                continue
            # not at the same (path, name) in the boundary closure:
            # same-name elsewhere in the boundary closure (move/rebind)?
            moved = [
                (p, fp) for (p, n), fp in bclosure.items() if n == hname
            ]
            if any(fp == now_hfp for _, fp in moved):
                continue  # pure move or rebind-to-identical
            if moved:
                diffs.append(
                    f"{hpath}::{hname} (changed; resolution moved from "
                    + "/".join(p for p, _ in moved)
                    + ")"
                )
                continue
            # outside the boundary closure entirely: existed-unchanged
            # elsewhere at the boundary (lookup) or genuinely new code
            old_any = boundary_fps.lookup(sha, hpath, hname)
            if old_any == now_hfp:
                continue
            why = "new since boundary" if old_any is None else "changed"
            diffs.append(f"{hpath}::{hname} ({why})")
        # Reverse direction: a symbol the consumer reached at the
        # boundary that no longer resolves package-internal means an
        # import was rebound to an external/vendored implementation (the
        # import statement itself lives in no fingerprinted symbol) —
        # flag it rather than letting the closure silently collapse.
        now_names = {n for (_, n) in closure}
        for (bp, bn) in sorted(bclosure):
            if bn not in now_names:
                diffs.append(
                    f"{bp}::{bn} (no longer resolved package-internal)"
                )
        if diffs:
            helper_hits.append((name, rnd, diffs))

    print(f"registry: {len(order)} queries; window: first {args.window}")
    print(f"now side: {now_provider.name}; current round: r{current_round}")
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
    if helper_hits:
        print(f"\nhelper closure changed since last attestation ({len(helper_hits)}):")
        for name, rnd, diffs in sorted(helper_hits):
            if name in window:
                mark = "in-window"
            else:
                d = deferrals.get(name)
                if d and current_round <= d.get("must_attest_by", -1):
                    mark = f"deferred to r{d['must_attest_by']} (warning)"
                elif d:
                    mark = f"** DEFERRAL EXPIRED r{d['must_attest_by']} **"
                    ok = False
                else:
                    mark = "** OUTSIDE WINDOW, NOT DEFERRED **"
                    ok = False
            print(f"  {name} (last green r{rnd}) [{mark}]")
            for why in diffs:
                print(f"      {why}")
    else:
        print("\nno helper closure changed since its consumer's last attestation")
    # A body-changed query's helper flags are suppressed (the body flag
    # subsumes them), so its deferral may still be live — only call a
    # deferral stale when the query is clean on BOTH checks.
    flagged_names = {n for n, _, _ in helper_hits} | {n for n, _, _ in changed}
    stale_deferrals = [q for q in deferrals if q not in flagged_names]
    if stale_deferrals:
        print(f"\ndeferrals no longer needed (clean or re-attested): {stale_deferrals}")
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
