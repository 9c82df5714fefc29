"""Model-based testing of the snapshot-table DML surface.

A seeded random sequence of operations (append, COW delete/update,
MOR delete/update/merge, compaction, DV materialization, optimize)
runs against both the real snapshot table and a pure-python
dict-of-rows model; after EVERY step the table contents must equal the
model exactly, and at the end the change feed from v1 must replay into
the final state. This is the test shape that catches interaction bugs
between features that are individually green (e.g. a COW rewrite
resurrecting MOR-deleted rows, compaction dropping tombstones too
early, merge double-applying under retries).

Deterministic: ``random.Random(seed)`` per case, three seeds — failures
reproduce exactly.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lakehouse_platform_nyc_taxi_spark.sources import snapshots as snap

SCHEMA = "id long, grp long, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _table_rows(spark, path):
    # positional: the random sequence may have renamed columns
    return {tuple(r) for r in snap.read_table(spark, path).collect()}


def _model_rows(model):
    return {(i, g, v) for i, (g, v) in model.items()}


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 23, 91])
def test_random_dml_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"model_{seed}")
    next_id = [0]

    def fresh_rows(n):
        rows = []
        for _ in range(n):
            i = next_id[0]
            next_id[0] += 1
            rows.append((i, i % 5, float(i % 17)))
        return rows

    model: dict[int, tuple[int, float]] = {}
    base = fresh_rows(40)
    snap.create_table(_df(spark, base).repartition(3), path)
    model.update({i: (g, v) for i, g, v in base})

    def _aligned(rows):
        df = _df(spark, rows)
        vc = _vcol()
        return df.withColumnRenamed("v", vc) if vc != "v" else df

    def op_append():
        rows = fresh_rows(rng.randint(1, 10))
        snap.append(_aligned(rows), path)
        model.update({i: (g, v) for i, g, v in rows})

    def op_cow_delete():
        g = rng.randrange(5)
        snap.delete_where(spark, path, F.col("grp") == g)
        for i in [i for i, (gg, _) in model.items() if gg == g]:
            del model[i]

    def op_mor_delete():
        lo = rng.randrange(max(next_id[0], 1))
        hi = lo + rng.randint(0, 15)
        snap.delete_where_mor(spark, path, F.col("id").between(lo, hi))
        for i in [i for i in model if lo <= i <= hi]:
            del model[i]

    def _vcol():
        return "v" if "v" in snap.read_table(spark, path).columns else "w"

    def op_cow_update():
        g = rng.randrange(5)
        vc = _vcol()
        snap.update_where(
            spark, path, F.col("grp") == g, {vc: F.col(vc) + 100.0}
        )
        for i, (gg, v) in list(model.items()):
            if gg == g:
                model[i] = (gg, v + 100.0)

    def op_mor_update():
        lo = rng.randrange(max(next_id[0], 1))
        hi = lo + rng.randint(0, 12)
        snap.update_where_mor(
            spark, path, F.col("id").between(lo, hi), {_vcol(): F.lit(-1.0)}
        )
        for i in model:
            if lo <= i <= hi:
                model[i] = (model[i][0], -1.0)

    def op_mor_merge():
        upd = rng.sample(sorted(model), min(len(model), rng.randint(1, 5)))
        new = fresh_rows(rng.randint(0, 3))
        rows = [(i, model[i][0], 55.5) for i in upd] + new
        if not rows:
            return
        snap.merge_into_mor(spark, path, _aligned(rows), key_cols=["id"])
        for i, g, v in rows:
            model[i] = (g, v)

    def op_cow_merge():
        upd = rng.sample(sorted(model), min(len(model), rng.randint(1, 4)))
        new = fresh_rows(rng.randint(0, 2))
        rows = [(i, model[i][0], 77.0) for i in upd] + new
        if not rows:
            return
        snap.merge_into(spark, path, _aligned(rows), ["id"])
        for i, g, v in rows:
            model[i] = (g, v)

    def op_merge_delete():
        victims = rng.sample(sorted(model), min(len(model), rng.randint(1, 4)))
        if not victims:
            return
        rows = [(i, 0, 0.0) for i in victims]
        snap.merge_into_mor(
            spark,
            path,
            _df(spark, rows).select("id"),
            key_cols=["id"],
            when_matched="delete",
        )
        for i in victims:
            del model[i]

    def op_compact():
        snap.compact_small_files(spark, path, target_bytes=1 << 20)

    def op_materialize():
        snap.materialize_dvs(spark, path)

    def op_optimize():
        snap.optimize_table(spark, path, cluster_by=["id"], target_files=3)

    def op_rename_toggle():
        cols = snap.read_table(spark, path).columns
        if "v" in cols:
            snap.rename_column(path, "v", "w")
        else:
            snap.rename_column(path, "w", "v")

    ops = [
        op_rename_toggle,
        op_append, op_append,
        op_cow_delete, op_mor_delete, op_mor_delete,
        op_cow_update, op_mor_update,
        op_mor_merge, op_cow_merge, op_merge_delete,
        op_compact, op_materialize, op_optimize,
    ]
    trace = []
    for step in range(14):
        op = rng.choice(ops)
        trace.append(op.__name__)
        if not model and op not in (op_append,):
            op = op_append
        op()
        got = _table_rows(spark, path)
        want = _model_rows(model)
        assert got == want, (
            f"seed={seed} step={step} after {trace}: "
            f"extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}"
        )

    # change-feed replay: v1 rows + feed deltas == final state
    final_v = snap.current_version(path)
    ch = snap.table_changes(spark, path, 1, final_v)
    replay = {
        tuple(r) for r in snap.read_table(spark, path, 1).collect()
    }
    inserts = []
    deletes = []
    for r in ch.collect():
        row = tuple(r)[:3]  # positional: final version may be renamed
        (inserts if r._change_type == "insert" else deletes).append(row)
    for row in deletes:
        replay.discard(row)
    replay.update(inserts)
    assert replay == _model_rows(model), f"seed={seed}: CDF replay diverged"
