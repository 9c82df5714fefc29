"""Inline data-quality observation — expectations evaluated DURING the
write, not by a second scan.

``run_assertions`` (assertions.py) is the post-hoc dbt-test pass: a
separate job over the materialized model. At 100 TB a second full scan
per model is real money; the production pattern (Delta Live Tables
expectations, Spark's ``Dataset.observe``) rides the metrics on the
SAME job that materializes the data: each expectation becomes a
``sum(case when violated then 1 else 0 end)`` accumulator inside the
write's plan, collected from the driver-side listener when the action
finishes — zero extra scans, zero extra shuffles.

Batch: ``observed_write`` returns the violation counts alongside the
write. Streaming: ``observe`` metrics surface per micro-batch through
``StreamingQueryProgress.observedMetrics``; ``drain_with_expectations``
accumulates them across an availableNow drain.

``on_violation`` policies mirror DLT: ``"track"`` records counts only,
``"fail"`` raises after the write if any expectation was violated
(write-audit-publish belongs on snapshot tables, where the commit is
atomic anyway — see sources/snapshots.py).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class ExpectationError(RuntimeError):
    """Raised by on_violation='fail' with the per-expectation counts."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        bad = {k: v for k, v in counts.items() if v}
        super().__init__(f"expectations violated: {bad}")


def _metric_cols(expectations: Mapping[str, Column]) -> list[Column]:
    return [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(name)
        for name, cond in expectations.items()
    ] + [F.count(F.lit(1)).alias("_rows_observed")]


def observed_write(
    df: DataFrame,
    path: str,
    expectations: Mapping[str, Column],
    on_violation: str = "track",
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Write ``df`` while counting expectation violations in the SAME
    job (``Dataset.observe`` accumulators — no second scan). Each
    expectation maps name -> boolean VIOLATION column (true == bad row,
    the assertions.py convention). Returns the counts, including
    ``_rows_observed``.

    ``on_violation="fail"`` raises ``ExpectationError`` AFTER the write
    completes — observe() cannot veto mid-job; pair with snapshot-table
    commits (write-audit-publish) when failed data must never become
    visible.
    """
    if on_violation not in ("track", "fail"):
        raise ValueError(f"unknown on_violation policy: {on_violation!r}")
    obs = Observation()
    observed = df.observe(obs, *_metric_cols(expectations))
    writer = observed.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    counts = {k: int(v) for k, v in obs.get.items()}
    if on_violation == "fail" and any(
        v for k, v in counts.items() if k != "_rows_observed"
    ):
        raise ExpectationError(counts)
    return counts


def drain_with_expectations(
    stream_df: DataFrame,
    expectations: Mapping[str, Column],
    output_mode: str = "append",
) -> tuple[DataFrame, dict[str, int]]:
    """Drain a stream (availableNow, memory sink) with expectation
    counters attached via ``observe``; per-micro-batch metrics surface
    in ``StreamingQueryProgress.observedMetrics`` and are summed here.
    Late-data accounting rides along for free:
    ``_rows_dropped_by_watermark`` accumulates every stateful operator's
    ``numRowsDroppedByWatermark`` — the rows the pipeline silently
    discarded as too late, which any production stream must alert on.
    Returns (sink contents, accumulated counts)."""
    from ..streaming.ops import _SINK_IDS

    name = f"_obs_sink_{next(_SINK_IDS)}"
    observed = stream_df.observe(
        "expectations", *_metric_cols(expectations)
    )
    q = (
        observed.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals: dict[str, int] = {"_rows_dropped_by_watermark": 0}
    for prog in q.recentProgress:
        for op in prog.stateOperators or []:
            totals["_rows_dropped_by_watermark"] += int(
                op.numRowsDroppedByWatermark or 0
            )
        row = (prog.observedMetrics or {}).get("expectations")
        if row is None:
            continue
        for k, v in row.asDict().items():
            if v is not None:
                totals[k] = totals.get(k, 0) + int(v)
    spark = stream_df.sparkSession
    return spark.table(name), totals


def guarded_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "left",
):
    """Join with an inline fan-out guard: a silent cardinality bug — the
    "N:1" dimension that actually has duplicate keys — multiplies fact
    rows without any error, and at 100 TB the first symptom is a bill.
    Observes the left-side and output row counts on the SAME job
    (``Dataset.observe`` accumulators, zero extra scans) so the
    contract "output rows <= left rows" is checked for free.

    Returns ``(df, verify)``: run an action on ``df``, then call
    ``verify()`` — it raises :class:`ExpectationError` with the extra
    row count if the join fanned out, else returns the observed
    ``{"left_rows": n, "out_rows": m}``. Valid for ``left``/``inner``
    joins (semantics where the left side is the preserved fact stream);
    outer/cross joins have no such contract and are rejected.
    """
    if how not in ("left", "inner", "leftouter", "left_outer"):
        raise ValueError(
            f"guarded_join contract requires a left/inner join, got {how!r}"
        )
    obs_in = Observation("join_guard_in")
    obs_out = Observation("join_guard_out")
    out = (
        left.observe(obs_in, F.count(F.lit(1)).alias("rows"))
        .join(right, on, how)
        .observe(obs_out, F.count(F.lit(1)).alias("rows"))
    )

    def verify() -> dict[str, int]:
        i = obs_in.get["rows"]
        o = obs_out.get["rows"]
        if o > i:
            raise ExpectationError({"join_fanout_extra_rows": o - i})
        return {"left_rows": i, "out_rows": o}

    return out, verify
