#!/usr/bin/env python
"""Dump the formatted physical plan of every harness query to
tools/plans/<name>.txt — the raw material for plan iteration
(pushdown/broadcast/shuffle auditing) without re-deriving each one.

Usage: PYTHONPATH=/root/repo python tools/explain_all.py [sf_dir]
Streaming queries are skipped (they execute at build time).
"""

from __future__ import annotations

import os
import sys

from lakehouse_platform_nyc_taxi_spark import harness
from lakehouse_platform_nyc_taxi_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = os.path.join(os.path.dirname(__file__), "plans")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain_all", shuffle_partitions=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, spec in sorted(harness.registry().items()):
        if name.startswith("streaming_") or name in ("similarity_topk_ivf", "dedup_clusters"):
            continue  # these execute work at build time
        df = spec.fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(text)
        exchanges = text.count("Exchange")
        scans = text.count("Location: InMemoryFileIndex")
        print(f"{name}: {exchanges} exchanges, {scans} scans")
    return 0


if __name__ == "__main__":
    sys.exit(main())
