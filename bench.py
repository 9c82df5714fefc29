#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through its full physical plan with a noop sink
(count() would let Catalyst prune the projected columns and undercount
the work). The session is warmed with one tiny job so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from lakehouse_platform_nyc_taxi_spark import harness
from lakehouse_platform_nyc_taxi_spark.session import get_spark


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    # warm the JVM / codegen path outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(harness.registry().items()):
        # Offline setup (e.g. ANN index build) runs untimed — a deployment
        # builds the index once per corpus, not per query.
        if spec.prepare is not None:
            spec.prepare(spark, sf_dir)
        # fn() inside the timer: batch queries only build a lazy plan there,
        # but streaming queries drain the stream during fn() — excluding it
        # would under-bill them to the cost of scanning the memory sink.
        start = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 4)
        # untimed: collect garbage between queries so accumulated state
        # (checkpoint RDDs, codegen classes) from earlier queries doesn't
        # bill GC pauses to whichever query runs late in the session
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 4)
    detail = {
        "metric": "total_runtime_all_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "n_queries": len(timings),
        "cpus": cpus,
    }
    # Per-query map goes to a file (and stderr): the driver captures a
    # bounded tail of stdout, and a single multi-KB line gets truncated
    # mid-JSON (BENCH_r01 "parsed": null). stdout carries exactly ONE
    # short JSON line so any head- or tail-window capture parses it.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "total_runtime_all_queries",
                "value": total,
                "unit": "sec",
                "sf": _sf_from_dir(sf_dir),
                "n_queries": len(timings),
                "cpus": cpus,
                "queries_file": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
