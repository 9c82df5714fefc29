"""Unit coverage for the helper-closure half of tools/rotation_audit.py
(the r18 extension): the resolver must see every package-internal symbol
a registry function transitively reaches — same-module helpers,
relative-import symbols, module-alias attribute calls, module-level
constants — because a miss here silently re-opens the attested-body
blind spot the tool exists to close. Pure AST work, no git and no Spark
session needed."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def audit():
    spec = importlib.util.spec_from_file_location(
        "rotation_audit", os.path.join(REPO, "tools", "rotation_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("rotation_audit", mod)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def resolver(audit):
    return audit._Resolver(audit.WorkingTree())


def _closure_names(audit, resolver, module_path, fn_name):
    return {
        (path.split("/")[-1], name)
        for (path, name) in audit.helper_closure(resolver, module_path, fn_name)
    }


def test_closure_sees_same_module_helpers_and_constants(audit, resolver):
    got = _closure_names(
        audit,
        resolver,
        "lakehouse_platform_nyc_taxi_spark/operators/multimodal.py",
        "phash_bands",
    )
    # the exact seams whose r17 rewrite motivated the extension
    assert ("multimodal.py", "_decode_pnm") in got
    assert ("multimodal.py", "_nearest_resize") in got
    assert ("multimodal.py", "_NUMPY_MIN_BYTES") in got
    assert ("multimodal.py", "PHASH_SCHEMA") in got


def test_closure_follows_relative_imports_across_modules(audit, resolver):
    # dedup_audio_neardup (harness/llm.py) reaches operators via
    # module-alias attribute calls (multimodal.audio_energy_bands,
    # dedup.hamming_banded_pairs) and those helpers' own constants
    got = _closure_names(
        audit,
        resolver,
        "lakehouse_platform_nyc_taxi_spark/harness/llm.py",
        "dedup_audio_neardup",
    )
    assert ("multimodal.py", "audio_energy_bands") in got
    assert ("dedup.py", "hamming_banded_pairs") in got
    assert ("multimodal.py", "_NUMPY_MIN_BYTES") in got


def test_closure_excludes_root_and_external_symbols(audit, resolver):
    got = audit.helper_closure(
        resolver,
        "lakehouse_platform_nyc_taxi_spark/operators/multimodal.py",
        "phash_bands",
    )
    names = {name for (_, name) in got}
    assert "phash_bands" not in names, "root fn is covered by the body check"
    assert not any(n in names for n in ("F", "pd", "DataFrame")), (
        "third-party names must not enter the closure"
    )


def test_fingerprint_ignores_docstrings_and_doc_kwarg(audit):
    a = audit.fn_fingerprint(
        'def f(x):\n    """doc one"""\n    return x + 1\n', "f"
    )
    b = audit.fn_fingerprint(
        'def f(x):\n    """totally different"""\n    return x + 1\n', "f"
    )
    c = audit.fn_fingerprint("def f(x):\n    return x + 2\n", "f")
    assert a == b
    assert a != c


def test_deferral_gating(audit, monkeypatch, tmp_path):
    d = tmp_path / "def.json"
    d.write_text(
        '{"_comment": ["ignored"], "q": {"must_attest_by": 19, "reason": "r"}}'
    )
    monkeypatch.setattr(audit, "DEFERRALS_PATH", str(d))
    loaded = audit.load_deferrals()
    assert set(loaded) == {"q"}, "underscore keys must not parse as queries"
    assert loaded["q"]["must_attest_by"] == 19
