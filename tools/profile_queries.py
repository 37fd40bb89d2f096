"""Per-query profiling helper for optimization rounds (guide §1).

Usage:
    python -m tools.profile_queries [query ...]        # all benched if none
    PROFILE_REPS=3 python -m tools.profile_queries q1_pricing_summary

For each query: one warm-up, then REPS timed runs through the noop sink
(guide §1.4 — computes every column of every row, no optimizer pruning of
the timed plan), wall + process-tree CPU seconds per rep (min reported),
and the formatted physical plan written to plans/<tag>/<name>_<suffix>.txt
(PROFILE_PLAN_DIR / PROFILE_PLAN_SUFFIX control where; default
plans/scratch/<name>_profile.txt).

This is a measurement tool only — bench.py remains the driver contract
(same .count() action as every prior round, so numbers stay comparable).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import tree_cpu_monotone  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    plan_dir = os.path.join(
        _REPO, os.environ.get("PROFILE_PLAN_DIR", "plans/scratch")
    )
    suffix = os.environ.get("PROFILE_PLAN_SUFFIX", "profile")
    os.makedirs(plan_dir, exist_ok=True)

    from hadoop_bam_spark.queries import REGISTRY
    from hadoop_bam_spark.session import get_spark

    spark = get_spark("profile")
    names = sys.argv[1:] or [n for n, s in REGISTRY.items() if s.bench]

    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}:warmup")
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        walls, cpus = [], []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{i}")
            df = fn(spark, sf_dir)
            c0, t0 = tree_cpu_monotone(), time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            cpus.append(tree_cpu_monotone() - c0)
        out[name] = {
            "wall_min": round(min(walls), 3),
            "cpu_min": round(min(cpus), 3),
            "walls": [round(w, 3) for w in walls],
            "cpus": [round(c, 3) for c in cpus],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
