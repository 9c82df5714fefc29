"""The Python-extension surface: pandas UDF, grouped-agg pandas UDF
(UDAF), and Python UDTF — completing SURVEY §2.10.

The engine's stance is that Python is the slow path: every hot-path
operator is built-in Catalyst expressions, and the only production
Python is Arrow-batched (multimodal mapInPandas, streaming state op).
These registrations exist for the cases a user genuinely needs them —
logic with no Catalyst equivalent — and demonstrate the *right* way to
write each kind: vectorized over Arrow batches, never row-at-a-time.

Construction is lazy: ``pandas_udf``/``udtf`` parse their DDL return
types against the active session, so decorating at import time fails in
a session-less process. Each public callable builds (and caches) its
Spark function on first use instead.

All three register into the session catalog (``register_python_functions``)
so they are callable from ``spark.sql`` exactly like built-ins.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, SparkSession

_CACHE: dict[str, object] = {}


def _geometric_mean_impl(v: pd.Series) -> float:
    x = v[v > 0]
    if len(x) == 0:
        return float("nan")
    # log-domain sum for overflow safety; pandas vectorizes the whole batch
    import numpy as np

    return float(math.exp(np.log(x.to_numpy(dtype="float64")).mean()))


def _winsorized_mean_impl(v: pd.Series) -> float:
    if len(v) == 0:
        return float("nan")
    lo, hi = v.quantile(0.05), v.quantile(0.95)
    return float(v.clip(lo, hi).mean())


class SplitSentences:
    """Python UDTF body: one output row per sentence of the input text.

    A table function (1 row -> N rows) with per-row Python logic — the
    shape that fits neither a scalar UDF nor a builtin generator when
    the splitting logic grows beyond a regex (abbreviation handling,
    quote tracking). Arrow-batched like every Python boundary here.
    """

    def eval(self, text: str):  # noqa: D102 — contract fixed by Spark
        if text is None:
            return
        import re

        parts = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
        for i, s in enumerate(parts):
            yield s, i, len(s)


def _gmean_udf():
    if "gmean" not in _CACHE:
        from pyspark.sql.functions import pandas_udf

        _CACHE["gmean"] = pandas_udf("double")(_geometric_mean_impl)
    return _CACHE["gmean"]


def _wmean_udf():
    if "wmean" not in _CACHE:
        from pyspark.sql.functions import pandas_udf

        _CACHE["wmean"] = pandas_udf("double")(_winsorized_mean_impl)
    return _CACHE["wmean"]


def sentence_splitter():
    """The UDTF object (built lazily): use via ``register_python_functions``
    + SQL ``LATERAL split_sentences(text)``, or directly."""
    if "udtf" not in _CACHE:
        from pyspark.sql.functions import udtf

        _CACHE["udtf"] = udtf(
            SplitSentences, returnType="sentence: string, sentence_idx: int, n_chars: int"
        )
    return _CACHE["udtf"]


def geometric_mean(col) -> Column:
    """Grouped-agg pandas UDAF: geometric mean of positive values.

    No Catalyst builtin exists (exp(avg(ln(x))) loses precision on wide
    ranges); the UDAF sees each group as one Arrow batch. Usable in
    ``groupBy(...).agg(geometric_mean("col"))`` and over windows.
    """
    return _gmean_udf()(col)


def winsorized_mean(col) -> Column:
    """Grouped-agg pandas UDAF: mean after clipping to the 5th/95th
    percentile — the robust-statistics pattern for fare/amount columns
    where a handful of bad meters would dominate a plain mean."""
    return _wmean_udf()(col)


def register_python_functions(spark: SparkSession) -> None:
    """Catalog registration: after this, ``spark.sql`` can call
    ``geometric_mean(x)``, ``winsorized_mean(x)`` and
    ``LATERAL split_sentences(text)``."""
    spark.udf.register("geometric_mean", _gmean_udf())
    spark.udf.register("winsorized_mean", _wmean_udf())
    spark.udtf.register("split_sentences", sentence_splitter())
