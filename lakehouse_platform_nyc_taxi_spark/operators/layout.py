"""Data-layout operators: Z-order (Morton) clustering, zone-map
statistics, and data-skipping simulation.

At 100 TB the cheapest query is the one that never reads the file:
engines prune files whose per-file min/max (zone map) cannot satisfy
the predicate. Which files CAN be pruned is decided at write time by
the sort order — a single-column sort clusters that column perfectly
and leaves every other column unsorted, while a Z-order interleave
spreads locality across dimensions so range predicates on ANY of the
interleaved columns prune a large fraction of files (the idea behind
Delta OPTIMIZE ZORDER BY / Iceberg sort orders).

Everything here is pure Catalyst column arithmetic — the bit
interleave unrolls to ~4·bits integer ops fused into whole-stage
codegen; no UDFs, no shuffle beyond the zone-map aggregation itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_unit_rank(col: Column, mn: Column, mx: Column, bits: int = 16) -> Column:
    """Scale ``col`` into the integer grid [0, 2**bits) using the
    (broadcast) min/max columns: floor((col - mn) * (2**bits - 1) / span).

    The min/max come from a 1-row aggregate broadcast-joined back (the
    incremental_watermark pattern) — no driver collect, so the whole
    layout computation stays one distributed plan.
    """
    span = (mx - mn).cast("double")
    scaled = F.floor((col - mn).cast("double") * F.lit(float(2**bits - 1)) / span)
    return F.when(span > 0, scaled).otherwise(F.lit(0)).cast("long")


def morton_interleave(ranks: list[Column], bits: int = 16) -> Column:
    """Morton interleave of N integer ranks in [0, 2**bits): bit b of
    rank i lands at position b*N + i (rank 0 is the least-significant
    dimension). Unrolled to N*bits shift/mask/or terms — all long
    arithmetic inside codegen.

    The interleave must fit a 64-bit signed long, and Spark's shiftleft
    masks shift amounts mod 64, so overflowing bit positions would
    silently WRAP and corrupt the ordering — ``bits`` is clamped to
    63 // N (callers that pre-scale must clamp the same way BEFORE
    scaling, as sources/snapshots.py::_zorder_value does, so rank
    values never exceed the interleaved resolution).
    """
    bits = min(bits, 63 // len(ranks))
    n = len(ranks)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Two-dimensional :func:`morton_interleave`: bit i of x at
    position 2i, bit i of y at 2i+1. 16+16 bits -> a 32-bit z-value,
    plenty of resolution for file-level clustering (file counts are
    ~1e5-1e6 even at 100 TB, far below 2**32 cells)."""
    return morton_interleave([x, y], bits)


def zorder_value_sql(x: str, y: str, bits: int = 16) -> str:
    """The exact SQL twin of :func:`zorder_value` (DuckDB/ANSI bit ops),
    for oracle parity: identical term order, identical integer types."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def file_id(rank: Column, rank_bits: int, n_files_log2: int) -> Column:
    """Assign a file by the top ``n_files_log2`` bits of a rank or
    z-value — value-range bucketing, shuffle-free and deterministic
    (unlike ntile, which needs a global sort). File sizes vary with the
    data distribution; at scale the writer would range-partition on the
    same key, which preserves the zone-map geometry measured here."""
    return F.shiftright(rank, rank_bits - n_files_log2).cast("long")


def zone_maps(
    df: DataFrame,
    layouts: dict[str, Column],
    dims: dict[str, Column],
    matches: dict[str, Column] | None = None,
    consts: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-(layout, file) zone maps: min/max of each dim column plus row
    and predicate-match counts. ``consts`` columns (e.g. predicate
    bounds derived from a broadcast stats row) are constant per group
    and carried through with a single min() each.

    One explode (len(layouts) structs per row) + ONE shuffle keyed on
    (layout, file_id) — the multi-layout comparison never rescans the
    table per layout. Output is tiny: n_layouts * n_files rows.
    """
    matches = matches or {}
    consts = consts or {}
    lf = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("layout"), col.alias("file_id")
                )
                for name, col in layouts.items()
            ]
        )
    ).alias("_lf")
    aggs = [F.count("*").alias("n_rows")]
    for d, col in dims.items():
        aggs.append(F.min(col).alias(f"{d}_min"))
        aggs.append(F.max(col).alias(f"{d}_max"))
    for m, col in matches.items():
        aggs.append(F.sum(col.cast("long")).alias(f"{m}_matched"))
    for k, col in consts.items():
        aggs.append(F.min(col).alias(k))
    return (
        df.select("*", lf)
        .groupBy(F.col("_lf.layout").alias("layout"), F.col("_lf.file_id").alias("file_id"))
        .agg(*aggs)
    )


def with_hilbert(
    df: DataFrame, x: str, y: str, out: str = "hilbert", bits: int = 16
) -> DataFrame:
    """Append a Hilbert-curve index column ``out`` for the integer rank
    columns (x, y) in [0, 2**bits) — the space-filling curve behind
    Databricks liquid clustering. Hilbert preserves locality strictly
    better than Morton on average: consecutive d values are ALWAYS
    adjacent cells (Morton jumps at quadrant boundaries), so file
    min/max ranges are tighter and range predicates prune more files.

    The classic per-level rotate/flip state machine (Wikipedia xy2d)
    unrolls into ``bits`` chained projections — one per level, highest
    bit first, each rewriting (hx, hy, accumulated d) with pure
    CASE/shift/mask arithmetic. Chained SELECTs (not one nested
    expression) keep the expression tree linear in ``bits``:
    CollapseProject leaves multi-referenced non-cheap aliases alone,
    so each level's state is computed once. Everything stays inside
    whole-stage codegen; no UDF, no shuffle.
    """
    n = 1 << bits
    df = df.select(
        "*",
        F.col(x).cast("long").alias("_hx"),
        F.col(y).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    others = [c for c in df.columns if c not in ("_hx", "_hy", "_hd")]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.shiftright(F.col("_hx"), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), level).bitwiseAND(F.lit(1))
        d = F.col("_hd") + ((F.lit(3) * rx).bitwiseXOR(ry)) * F.lit(s * s)
        nx = (
            F.when(ry == 1, F.col("_hx"))
            .when(rx == 1, F.lit(n - 1) - F.col("_hy"))
            .otherwise(F.col("_hy"))
        )
        ny = (
            F.when(ry == 1, F.col("_hy"))
            .when(rx == 1, F.lit(n - 1) - F.col("_hx"))
            .otherwise(F.col("_hx"))
        )
        df = df.select(
            *others, nx.alias("_hx"), ny.alias("_hy"), d.alias("_hd")
        )
    return df.select(*others, F.col("_hd").alias(out))


def hilbert_sql_ctes(
    prev: str,
    passthrough: list[str],
    x: str,
    y: str,
    out: str = "hilbert",
    bits: int = 16,
) -> str:
    """The exact SQL twin of :func:`with_hilbert`: a chain of ``bits``
    CTEs starting from CTE ``prev`` (which must expose ``passthrough``
    plus integer ranks ``x``/``y``), ending in a CTE named ``hil``
    exposing ``passthrough`` + ``out``. Level-indexed column names
    (hx{k}) sidestep lateral-alias ambiguity between engines."""
    n = 1 << bits
    cols = ", ".join(passthrough)
    parts = [
        f"h0 AS (SELECT {cols}, CAST({x} AS BIGINT) AS hx0, "
        f"CAST({y} AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 FROM {prev})"
    ]
    for k, level in enumerate(range(bits - 1, -1, -1), start=1):
        s = 1 << level
        px, py, pd = f"hx{k - 1}", f"hy{k - 1}", f"hd{k - 1}"
        rx = f"(({px} >> {level}) & 1)"
        ry = f"(({py} >> {level}) & 1)"
        parts.append(
            f"""h{k} AS (
      SELECT {cols},
        CASE WHEN {ry} = 1 THEN {px}
             WHEN {rx} = 1 THEN {n - 1} - {py} ELSE {py} END AS hx{k},
        CASE WHEN {ry} = 1 THEN {py}
             WHEN {rx} = 1 THEN {n - 1} - {px} ELSE {px} END AS hy{k},
        {pd} + (xor(3 * {rx}, {ry}) * {s * s}) AS hd{k}
      FROM h{k - 1})"""
        )
    parts.append(
        f"hil AS (SELECT {cols}, hd{bits} AS {out} FROM h{bits})"
    )
    return ",\n    ".join(parts)


def bloom_skipping_audit(
    df: DataFrame,
    file_col: str,
    key_col: str,
    probes: list[int],
    m_bits: int = 1024,
    k: int = 3,
) -> DataFrame:
    """File-level Bloom-filter skipping audit for POINT predicates —
    the companion to the zone-map audits: on a column uncorrelated
    with write order every file's min/max spans the whole domain and
    zone maps prune nothing, while a tiny per-file Bloom filter
    (Bloom 1970, public; the Parquet/Delta bloom-filter-index idea)
    prunes every file that provably lacks the key, at a measurable
    false-positive cost this audit reports.

    Per file: the filter is the distinct set of bit positions
    ``seeded_md5(key, i) % m_bits`` (i < k) over the file's distinct
    keys — built as one (file, bit) distinct aggregate, ≤ files ×
    m_bits rows total. A probe scans a file iff ALL of its (distinct)
    required bits are set. Everything is exact integer arithmetic on
    the cross-engine md5 family — no xxhash, no RNG.

    Output per probe (ascending): ``probe, n_files, files_bloom,
    files_zonemap, files_true`` — bloom vs zone-map vs ground-truth
    scan counts; ``files_bloom − files_true`` is the false-positive
    cost of ``m_bits``/``k`` at this file size.
    """
    import hashlib

    from .hashing import seeded_md5_long

    fcol = F.col(file_col).alias("_f")
    key = F.col(key_col).cast("long")
    from .fencing import fence_if_small

    fk = fence_if_small(df.select(fcol, key.alias("_k")).distinct())
    bit_arr = F.array(
        *[
            (seeded_md5_long(F.col("_k").cast("string"), i) % m_bits).cast(
                "int"
            )
            for i in range(k)
        ]
    )
    bits = (
        fk.select("_f", F.explode(bit_arr).alias("bit"))
        .distinct()
    )

    def _pbits(p: int) -> list[int]:
        out = set()
        for i in range(k):
            h = hashlib.md5(f"{p}#{i}".encode()).hexdigest()[:15]
            out.add(int(h, 16) % m_bits)
        return sorted(out)

    spark = df.sparkSession
    # r19 stage-count rework (guide §2.4 / §7.3 — the old form cost
    # ~8 serialized AQE stages of ~0.4 s scheduling floor each on 4-row
    # frames, measured piecewise at sf0.1):
    # - `need` (bits required per probe) is a PYTHON set size — attach
    #   it to the probe frame as a literal column instead of computing
    #   a count_distinct aggregate + an extra broadcast join in-plan;
    # - both sides of the `hit` join are distinct by construction
    #   (probe bits come from a set, the band table is .distinct()), so
    #   the per-(probe, file) bit count is a plain count(*) — drops the
    #   two-phase distinct-aggregate exchange;
    # - zone-map and ground-truth counts fold into ONE pass over the
    #   fenced fk table: the probes are driver literals, so a single
    #   groupBy(_f) computes each file's key span plus one
    #   contains-probe flag per probe (|files| rows), and the per-probe
    #   counts come from exploding a |probes|-entry struct array of
    #   that 1-row-per-file table — replaces two fk-consuming subplans
    #   (range BNLJ + equi-join) and their broadcast stages.
    probe_bits = spark.createDataFrame(
        [
            (int(p), b, len(_pbits(int(p))))
            for p in probes
            for b in _pbits(int(p))
        ],
        "probe long, bit int, _nreq int",
    )
    hit = (
        F.broadcast(probe_bits)
        .join(bits, "bit")
        .groupBy("probe", "_nreq", "_f")
        .agg(F.count(F.lit(1)).alias("_nhit"))
    )
    bloom_scan = (
        hit.filter(F.col("_nhit") == F.col("_nreq"))
        .groupBy("probe")
        .agg(F.count(F.lit(1)).cast("bigint").alias("files_bloom"))
    )
    per_file = fk.groupBy("_f").agg(
        F.min("_k").alias("_kmin"),
        F.max("_k").alias("_kmax"),
        *[
            F.max((F.col("_k") == F.lit(int(p))).cast("int")).alias(f"_has{j}")
            for j, p in enumerate(probes)
        ],
    )
    probe_entries = F.array(
        *[
            F.struct(
                F.lit(int(p)).alias("probe"),
                F.col(f"_has{j}").alias("_has"),
                (
                    (F.lit(int(p)) >= F.col("_kmin"))
                    & (F.lit(int(p)) <= F.col("_kmax"))
                )
                .cast("int")
                .alias("_in_span"),
            )
            for j, p in enumerate(probes)
        ]
    )
    zone_truth = (
        per_file.select(F.explode(probe_entries).alias("_e"))
        .groupBy(F.col("_e.probe").alias("probe"))
        .agg(
            F.sum("_e._in_span").cast("bigint").alias("files_zonemap"),
            F.sum("_e._has").cast("bigint").alias("files_true"),
        )
    )
    probe_df = spark.createDataFrame(
        [(int(p),) for p in probes], "probe long"
    )
    n_files = fk.select("_f").distinct().count()
    # broadcast the probe-sized summaries: the local probe frame has
    # no stats pre-AQE, so the 4-row assembly joins would otherwise
    # plan as SortMergeJoins with needless exchanges
    return (
        probe_df.join(F.broadcast(bloom_scan), "probe", "left")
        .join(F.broadcast(zone_truth), "probe", "left")
        .select(
            "probe",
            F.lit(n_files).cast("bigint").alias("n_files"),
            F.coalesce(F.col("files_bloom"), F.lit(0))
            .cast("bigint")
            .alias("files_bloom"),
            F.coalesce(F.col("files_zonemap"), F.lit(0))
            .cast("bigint")
            .alias("files_zonemap"),
            F.coalesce(F.col("files_true"), F.lit(0))
            .cast("bigint")
            .alias("files_true"),
        )
        .orderBy("probe")
    )
