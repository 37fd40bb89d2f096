"""Skew-mitigation tools: salted equi-join.

AQE's skew-join split (on by default in this engine's sessions) handles
most hot keys by splitting oversized shuffle partitions; explicit salting
remains the tool when one join key is so hot a single key exceeds an
executor (AQE cannot split WITHIN a key) or when AQE is unavailable
(streaming joins, non-adaptive deployments).

``salted_join`` replicates the build side ``salt`` times and scatters the
probe side across the replicas: the hot key's rows spread over ``salt``
partitions instead of one. Results are row-identical to the plain join;
cost is a ``salt``x blow-up OF THE SMALLER SIDE only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the join key salted ``salt`` ways.

    ``probe`` is the large/skewed side (gets a per-row random-free
    deterministic salt from a hash of its other columns via
    ``monotonically_increasing_id`` — stable within a job); ``build`` is
    replicated ``salt`` times. Output columns match
    ``probe.join(build, on, how)``.

    Only probe-preserving joins are supported: with ``right``/``full`` an
    unmatched build row would survive once per replica (``salt`` copies),
    and coalesced key columns would diverge from the plain join.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports probe-preserving joins only {sorted(allowed)}; "
            f"got {how!r} — a right/full join would duplicate unmatched build "
            "rows once per salt replica"
        )
    keys = [on] if isinstance(on, str) else list(on)
    p = probe.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    b = build.withColumn(
        "_replica", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = p["_salt"] == b["_replica"]
    for k in keys:
        cond = cond & (p[k] == b[k])
    joined = p.join(b, cond, how)
    out = joined.drop(p["_salt"]).drop(b["_replica"])
    for k in keys:
        out = out.drop(b[k])
    return out
