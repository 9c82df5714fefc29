"""Z-order layout / zone-map skipping + incremental MinHash probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark import harness
from lakehouse_platform_nyc_taxi_spark.operators import dedup, layout
from lakehouse_platform_nyc_taxi_spark.operators.sampling import hash_bucket
from lakehouse_platform_nyc_taxi_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_reference(spark):
    cases = [
        (0, 0),
        (0, 65535),
        (65535, 0),
        (65535, 65535),
        (1, 2),
        (43690, 21845),  # alternating bit patterns
        (12345, 54321),
        (32768, 32767),
    ]
    df = spark.createDataFrame(cases, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", layout.zorder_value(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)


def test_zorder_skipping_sound_and_effective(spark):
    """Zone-map soundness: a skipped file contains no matching rows, so
    rows_matched summed over scanned files must equal the brute-force
    global match count — identically for every layout."""
    out = {
        (r.layout, r.predicate): r
        for r in harness.registry()["layout_zorder_skipping"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert len(out) == 6
    for pred in ("custkey_range", "date_range"):
        matched = {out[(lay, pred)].rows_matched for lay in ("linear", "sort_x", "zorder")}
        assert len(matched) == 1, f"{pred}: zone-map skipping dropped matches {matched}"
        for lay in ("linear", "sort_x", "zorder"):
            r = out[(lay, pred)]
            assert r.files_scanned <= r.n_files
            assert r.rows_matched <= r.rows_scanned
    # Brute-force the custkey predicate on the raw table.
    o = load_table(spark, SF_SMOKE, "orders")
    st = o.agg(F.min("o_custkey").alias("mn"), F.max("o_custkey").alias("mx")).first()
    lo = st.mn + 0.45 * (st.mx - st.mn)
    hi = st.mn + 0.55 * (st.mx - st.mn)
    brute = o.filter((F.col("o_custkey") >= lo) & (F.col("o_custkey") <= hi)).count()
    assert out[("zorder", "custkey_range")].rows_matched == brute
    # Effectiveness: the multi-dim layout must beat insertion order on
    # both dimensions (the point of Z-ordering).
    for pred in ("custkey_range", "date_range"):
        assert (
            out[("zorder", pred)].files_scanned
            < out[("linear", pred)].files_scanned
        )


def test_minhash_probe_matches_pairs_cross_subset(spark):
    """Probing batch-vs-index must find exactly the full self-join's
    pairs that straddle the batch/index split (reoriented new-first)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    sigs = dedup.minhash_signatures(docs).localCheckpoint()
    bucket = hash_bucket(F.col("doc_id"), "incr")
    probe = {
        (r.new_doc, r.index_doc): r.jaccard_est
        for r in dedup.minhash_lsh_probe(
            sigs.filter(bucket < 1000), sigs.filter(bucket >= 1000)
        ).collect()
    }
    is_new = {
        r.doc_id: r.b < 1000
        for r in docs.select("doc_id", bucket.alias("b")).collect()
    }
    expected = {}
    for r in dedup.minhash_lsh_pairs(docs).collect():
        if is_new[r.doc_a] != is_new[r.doc_b]:
            new, idx = (r.doc_a, r.doc_b) if is_new[r.doc_a] else (r.doc_b, r.doc_a)
            expected[(new, idx)] = r.jaccard_est
    assert probe == expected
    assert expected, "smoke data produced no cross-split pairs; test is vacuous"


def test_label_propagation_barbell(spark):
    """Two dense triangles joined by one weak bridge: LPA must find the
    two communities, which min-label CC (one component) cannot."""
    from lakehouse_platform_nyc_taxi_spark.operators.graph import label_propagation

    edges = [
        # triangle A: 1-2-3, strong
        (1, 2, 10.0), (2, 3, 10.0), (1, 3, 10.0),
        # triangle B: 4-5-6, strong
        (4, 5, 10.0), (5, 6, 10.0), (4, 6, 10.0),
        # weak bridge
        (3, 4, 1.0),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r.id: r.label
        for r in label_propagation(df, iterations=3, weight="w").collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6}
    a = {got[1], got[2], got[3]}
    b = {got[4], got[5], got[6]}
    assert len(a) == 1 and len(b) == 1 and a != b


def _hilbert_ref(x: int, y: int, bits: int = 16) -> int:
    n = 1 << bits
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_locality(spark):
    from lakehouse_platform_nyc_taxi_spark.operators.layout import with_hilbert

    cases = [
        (0, 0), (0, 65535), (65535, 0), (65535, 65535),
        (1, 0), (0, 1), (1, 1),
        (43690, 21845), (12345, 54321), (32768, 32767), (40000, 1),
    ]
    df = spark.createDataFrame(cases, "x long, y long")
    got = {
        (r.x, r.y): r.h
        for r in with_hilbert(df, "x", "y", out="h").collect()
    }
    for x, y in cases:
        assert got[(x, y)] == _hilbert_ref(x, y), (x, y)
    # locality: consecutive d on a small grid are always adjacent cells
    bits = 4
    grid = [(x, y) for x in range(16) for y in range(16)]
    sdf = spark.createDataFrame(grid, "x long, y long")
    by_d = {
        r.h: (r.x, r.y)
        for r in with_hilbert(sdf, "x", "y", out="h", bits=bits).collect()
    }
    assert sorted(by_d) == list(range(256))
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_skipping_sound(spark):
    out = {
        (r.layout, r.predicate): r
        for r in harness.registry()["layout_hilbert_skipping"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert len(out) == 4
    for pred in ("custkey_range", "date_range"):
        matched = {out[(lay, pred)].rows_matched for lay in ("zorder", "hilbert")}
        assert len(matched) == 1, f"{pred}: skipping dropped matches {matched}"


def test_rank_and_interleave_edge_cases(spark):
    """Degenerate spans and the 63-bit clamp: a constant column ranks to
    0 everywhere (no divide-by-zero), and morton_interleave never
    builds a shift past bit 62 regardless of requested bits."""
    from lakehouse_platform_nyc_taxi_spark.operators.layout import (
        minmax_unit_rank,
        morton_interleave,
    )

    df = spark.createDataFrame([(7, 7), (7, 7)], "v long, w long")
    st = df.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    out = (
        df.crossJoin(st.hint("broadcast"))
        .select(minmax_unit_rank(F.col("v"), F.col("mn"), F.col("mx")).alias("r"))
        .collect()
    )
    assert [r.r for r in out] == [0, 0]

    # bits=40 for 2 ranks must clamp to 31 (63 // 2), not wrap mod 64
    big = spark.createDataFrame([((1 << 31) - 1, (1 << 31) - 1)], "x long, y long")
    z = big.select(
        morton_interleave([F.col("x"), F.col("y")], bits=40).alias("z")
    ).collect()[0].z
    assert z == (1 << 62) - 1
    assert z > 0


def test_hilbert_matches_reference_random(spark):
    """Random 16-bit points (seeded): the chained-projection machine must
    agree with the pure-python reference everywhere, not just corners."""
    import random

    from lakehouse_platform_nyc_taxi_spark.operators.layout import with_hilbert

    rng = random.Random(4643)
    cases = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(200)]
    df = spark.createDataFrame(cases, "x long, y long")
    got = {(r.x, r.y): r.h for r in with_hilbert(df, "x", "y", out="h").collect()}
    for x, y in cases:
        assert got[(x, y)] == _hilbert_ref(x, y), (x, y)


def test_bloom_skipping_audit_exact_and_fp_bounded(spark):
    """Two files with disjoint keys: a present key bloom-scans only
    file(s) that could hold it and truth matches; an absent key has
    files_true == 0 and bloom <= zonemap when zone maps are wide."""
    from lakehouse_platform_nyc_taxi_spark.operators.layout import (
        bloom_skipping_audit,
    )

    rows = [(0, k) for k in (1, 100)] + [(1, k) for k in (50, 150)]
    df = spark.createDataFrame(rows, "file int, key long")
    out = {
        r.probe: r
        for r in bloom_skipping_audit(
            df, "file", "key", [1, 150, 999], m_bits=256, k=3
        ).collect()
    }
    assert out[1].n_files == 2
    assert out[1].files_true == 1 and out[1].files_bloom >= 1
    assert out[150].files_true == 1
    # 999 exists nowhere: zone maps exclude it (out of both ranges)
    assert out[999].files_true == 0 and out[999].files_zonemap == 0
    # bloom never misses a containing file
    for p in (1, 150):
        assert out[p].files_bloom >= out[p].files_true
