"""Pipeline-family scale stress: time registered queries at two SF
directories and report the time ratio against the data ratio.

Usage:
    python -m hadoop_bam_spark.tools.stress_pipeline SMALL_DIR BIG_DIR \
        [--queries=a,b,c] [--reps=3] [--json=OUT.json] \
        [--data-ratio=N] [--tolerance=1.6]

Exit status 1 (fail LOUDLY) when any query is classified superlinear.

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


def classify(time_ratio: float, data_ratio: float, rows_ratio: float,
             tolerance: float = 1.6) -> dict:
    """Output-normalized superlinearity verdict for one query.

    ``per_input_ratio``  = time growth / input-data growth;
    ``per_output_ratio`` = time growth / output-row growth.
    A query is ``superlinear`` only when BOTH exceed ``tolerance``:
    time that merely tracks a legitimately growing result set (a
    pair-generating dedup emitting more pairs at bigger SF) normalizes
    to ~1 per output row, while "output grew" can no longer excuse
    time that outran the output too — the r11 residual this closes.
    """
    per_in = time_ratio / max(data_ratio, 1e-9)
    per_out = time_ratio / max(rows_ratio, 1e-9)
    return {
        "per_input_ratio": round(per_in, 2),
        "per_output_ratio": round(per_out, 2),
        "superlinear": per_in > tolerance and per_out > tolerance,
    }


def _data_ratio(spark, small: str, big: str) -> float:
    """Input growth between the two dirs: the MAX row-count ratio across
    the pipeline-relevant tables (the stress corpora from make_scale
    grow documents/embeddings together; driver testdata SFs may grow
    only some tables — the most-grown one is the honest denominator).
    Override with --data-ratio when the corpus growth is known."""
    import os

    ratios = []
    for t in ("documents", "embeddings", "lineitem"):
        ps, pb = f"{small}/{t}.parquet", f"{big}/{t}.parquet"
        if os.path.exists(ps) and os.path.exists(pb):
            ns = spark.read.parquet(ps).count()
            nb = spark.read.parquet(pb).count()
            if ns:
                ratios.append(nb / ns)
    return max(ratios) if ratios else 1.0


def run_stress(small: str, big: str, queries: list[str] | None = None,
               reps: int = 3, data_ratio: float | None = None,
               tolerance: float = 1.6) -> dict:
    from hadoop_bam_spark.operators import cluster
    from hadoop_bam_spark.queries import REGISTRY
    from hadoop_bam_spark.session import get_spark

    names = queries or [q for q in _DEFAULT if q in REGISTRY]
    spark = get_spark()
    if data_ratio is None:
        data_ratio = _data_ratio(spark, small, big)
    out: dict = {"small_dir": small, "big_dir": big, "reps": reps,
                 "data_ratio": round(data_ratio, 2),
                 "tolerance": tolerance, "queries": {}}
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
        time_ratio = best[big] / max(best[small], 1e-9)
        rows_ratio = rows[big] / max(rows[small], 1)
        rec = {
            "small_s": round(best[small], 3),
            "big_s": round(best[big], 3),
            "time_ratio": round(time_ratio, 2),
            "rows_small": rows[small],
            "rows_big": rows[big],
            "rows_ratio": round(rows_ratio, 2),
        }
        rec.update(classify(time_ratio, data_ratio, rows_ratio, tolerance))
        if cc_mode:
            rec["cc_mode"] = cc_mode
        out["queries"][name] = rec
        print(f"{name}: {rec}", flush=True)
    out["superlinear"] = sorted(
        q for q, r in out["queries"].items() if r["superlinear"])
    return out


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(pos) < 2:
        print(__doc__)
        sys.exit(2)
    qs, reps, out_path, dr, tol = None, 3, None, None, 1.6
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            qs = a.split("=", 1)[1].split(",")
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--json="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--data-ratio="):
            dr = float(a.split("=", 1)[1])
        elif a.startswith("--tolerance="):
            tol = float(a.split("=", 1)[1])
    result = run_stress(pos[0], pos[1], qs, reps, dr, tol)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))
    if result["superlinear"]:
        print(f"SUPERLINEAR: {result['superlinear']}", file=sys.stderr)
        sys.exit(1)
