"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is run once to warm the JVM/parse paths, then timed (best of 5 —
the min is robust to the 1.1-1.3x uniform GC/scheduler noise this box shows;
r3's drift analysis in VERDICT.md motivated widening from best-of-3).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoop_bam_spark.queries import REGISTRY
    from hadoop_bam_spark.session import get_spark

    spark = get_spark("bench")
    names = [n for n, spec in REGISTRY.items() if spec.bench]

    # Warm-up: run every benchmarked query once (JVM JIT, parquet footers).
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).count()

    # Interleave reps round-robin: a transient host-load spike then degrades
    # one rep of every query instead of all reps of one query, so per-query
    # min stays meaningful on a noisy box.
    best: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(5):
        for name in names:
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).count()
            best[name] = min(best[name], time.time() - t0)
    timings = {n: round(v, 3) for n, v in best.items()}

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
