"""Pipeline-family scale stress: time registered queries at two SF
directories and report the time ratio against the data ratio.

Usage:
    python -m hadoop_bam_spark.tools.stress_pipeline SMALL_DIR BIG_DIR \
        [--queries=a,b,c] [--reps=3] [--json=OUT.json]

Rationale (SCALE.md): the per-round bench runs at a fixed SF, so a
super-linear operator looks fine until real scale. This tool is the
repeatable harness behind the sf3 (r5) and sf10 (r6) stress rows — run
each query ``reps`` times INTERLEAVED across the two directories (warm
JVM, best-of wall), and flag any query whose time ratio materially
exceeds the data ratio. At 100 TB the flagged query is the one that
melts; everything here must stay ~linear.

Also reports the connected-components execution mode for
``dedup_clusters`` (driver union-find vs distributed pointer-doubling
label propagation, and the distributed round count) so the stress proves
WHICH path ran — a 100 TB corpus always takes the distributed one.
"""

from __future__ import annotations

import json
import sys
import time

_DEFAULT = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_exact_substring",
    "token_heavy_hitters",
    "tfidf_top_terms",
    "knn_bruteforce",
    "knn_ivf",
    "decontaminate_benchmark",
]


def run_stress(small: str, big: str, queries: list[str] | None = None,
               reps: int = 3) -> dict:
    from hadoop_bam_spark.operators import cluster
    from hadoop_bam_spark.queries import REGISTRY
    from hadoop_bam_spark.session import get_spark

    names = queries or [q for q in _DEFAULT if q in REGISTRY]
    spark = get_spark()
    out: dict = {"small_dir": small, "big_dir": big, "reps": reps,
                 "queries": {}}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, small).count()  # warm parse/JIT before any timing
        best = {small: float("inf"), big: float("inf")}
        rows = {}
        cc_mode = None
        for _ in range(reps):
            for d in (small, big):
                cluster.LAST_DISTRIBUTED_ROUNDS = 0
                t0 = time.time()
                rows[d] = fn(spark, d).count()
                best[d] = min(best[d], time.time() - t0)
                if name == "dedup_clusters":
                    rounds = cluster.LAST_DISTRIBUTED_ROUNDS
                    cc_mode = cc_mode or {}
                    cc_mode[d] = (
                        {"path": "distributed", "rounds": rounds}
                        if rounds else {"path": "driver-union-find"}
                    )
        rec = {
            "small_s": round(best[small], 3),
            "big_s": round(best[big], 3),
            "time_ratio": round(best[big] / max(best[small], 1e-9), 2),
            "rows_small": rows[small],
            "rows_big": rows[big],
        }
        if cc_mode:
            rec["cc_mode"] = cc_mode
        out["queries"][name] = rec
        print(f"{name}: {rec}", flush=True)
    return out


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(pos) < 2:
        print(__doc__)
        sys.exit(2)
    qs, reps, out_path = None, 3, None
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            qs = a.split("=", 1)[1].split(",")
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    result = run_stress(pos[0], pos[1], qs, reps)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))
