"""Interval (genomic range) overlap joins.

The reference expresses interval queries as split-level predicate pushdown
into BAI/tabix indexes (BAMInputFormat.java:542-644, VCFInputFormat.java:
388-472) plus a row-level residual filter (VCFRecordReader.java:213-219).
As a *join* between two record sets it has no reference implementation, so we
provide the two canonical Spark strategies:

- ``interval_join_broadcast``: small interval side → broadcast + range
  predicate. Catalyst executes a BroadcastNestedLoopJoin; no shuffle of the
  big side. Right choice when regions fit in executor memory (the common
  `-L intervals` case).

- ``interval_join_binned``: large × large → explode both sides onto
  fixed-size genome tiles (default 16 kb, the BAI linear-index granularity,
  BAMInputFormat.java:357-373), shuffle equi-join on (contig, bin),
  post-filter the exact overlap, and drop bin-induced duplicates by keeping
  only the pair's first shared bin. Scales linearly with data size; the join
  key (contig, bin) is high-cardinality so AQE can split skewed bins.

Overlap convention: closed intervals, 1-based, overlap iff
``a.start <= b.stop AND b.start <= a.stop`` (same as htsjdk Interval).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] = ("contig", "start", "stop"),
    how: str = "inner",
) -> DataFrame:
    """Overlap join with the (small) right side broadcast."""
    lc, ls, le = (F.col(k) for k in left_keys)
    rc, rs, re_ = (F.col(k) for k in right_keys)
    cond = (lc == rc) & (ls <= re_) & (rs <= le)
    return left.join(F.broadcast(right), cond, how)


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] = ("contig", "start", "stop"),
    bin_size: int = 16384,
    how: str = "inner",
    min_frac_left: float | None = None,
    min_frac_right: float | None = None,
    frac_either: bool = False,
    strand: str | None = None,
    strand_cols: Sequence[str] = ("strand", "strand"),
) -> DataFrame:
    """Large-by-large overlap join via genome binning.

    Each row is exploded to every ``bin_size`` tile its interval touches;
    the shuffle join runs on (contig, bin). A pair of overlapping intervals
    shares every bin their intersection touches — to emit it exactly once we
    keep only the bin containing max(left.start, right.start), which both
    sides are guaranteed to have exploded.

    ``how="left_outer_loose"`` keeps left rows with no overlapping right
    row as ONE null-extended row each (the row from the left interval's
    first bin) — every overlapping pair still appears exactly once, BUT
    a left row with matches elsewhere may ALSO carry one null row when
    its first bin had no match. That deliberately deviates from SQL
    left-outer semantics (hence the explicit name): aggregating
    consumers must ignore null right fields (collect_list and
    count(right-col) both do). This is what lets subtract/coverage keep
    untouched intervals without a second join against the left table.

    ``how="left_outer"`` is TRUE SQL left-outer: a left row appears
    null-extended iff it overlaps nothing anywhere (duplicated left
    rows each keep their copies, like SQL). Costs an extra per-row-id
    match-count aggregate + join-back over the loose form (narrow: the
    count side shuffles a long id and a flag, never the left payload —
    the match count the loose consumers get for free in their own
    regroup) — use loose when the next operation aggregates per left
    row anyway.

    NOTE (r14→r15 API history): ``"left_outer"`` meant the LOOSE
    semantics through r13; r14 split the modes and pointed the bare
    string at the strict form. External callers migrating across that
    boundary should pick ``left_outer`` (SQL rows) vs
    ``left_outer_loose`` (aggregation-ready, one possible extra null
    row per matched left row) explicitly — see CHANGELOG.md.

    Overlap-fraction filters (bedtools intersect -f/-F/-e/-r, r15):
    ``min_frac_left`` requires ``overlap_len >= frac * left_len``
    (bedtools -f), ``min_frac_right`` the mirror on the right length
    (-F); with both set they must BOTH hold (like bedtools -f -F)
    unless ``frac_either`` (-e) relaxes to either-suffices; -r is just
    ``min_frac_left == min_frac_right``. The fraction predicate is part
    of the MATCH definition, so outer modes null-extend a left row
    whose every overlap fails the fraction test — exactly bedtools
    ``intersect -f ... -v`` complementarity.

    Strand restriction (bedtools intersect -s / -S, r16):
    ``strand="same"`` requires the two rows' strands to match
    (null-safe equality, so null/'.' matches null/itself literally);
    ``"opposite"`` requires one '+' facing one '-' (a row with any
    other strand value can never match). ``strand_cols=(left_col,
    right_col)`` names the two strand columns. Like the fraction
    filters the restriction is part of the MATCH definition — outer
    modes null-extend a left row whose every overlap is on the wrong
    strand. An equi-conjunct, so Catalyst folds it into the shuffle
    join keys; no extra pass, no plan shape change.
    """
    if how not in ("inner", "left_outer", "left_outer_loose"):
        raise ValueError(f"unsupported how={how!r}")
    if strand not in (None, "same", "opposite"):
        raise ValueError(
            "strand must be None, 'same' (bedtools -s) or 'opposite' (-S)"
        )
    loose = how != "inner"
    strict = how == "left_outer"
    spark_how = "left_outer" if loose else "inner"
    lc, ls, le = left_keys
    rc, rs, re_ = right_keys
    if strict:
        # Row id for the match-count join-back (r14 VERDICT #7): the
        # dedup pass shuffles one narrow key instead of windowing over
        # every left column. Duplicate left tuples share the id AND the
        # match set, so per-id counting is per-tuple counting. 128-bit
        # identity (r16, ADVICE r15): a lone xxhash64 collision between
        # DISTINCT tuples would silently suppress a null-extended row at
        # ~n^2/2^64 — two differently-salted hashes push that to
        # ~n^2/2^128, unreachable at any row count.
        left = left.withColumn(
            "_lid", _row_id128([F.col(col) for col in left.columns])
        )

    def binned(df: DataFrame, contig: str, start: str, stop: str, side: str,
               keep_null: bool = False) -> DataFrame:
        bins = F.sequence(
            ((F.col(start) - 1) / bin_size).cast("long"),
            ((F.col(stop) - 1) / bin_size).cast("long"),
        )
        if keep_null:
            # NULL-coordinate rows must survive a left_outer join as
            # unmatched (sentinel bin -1; every real bin is >= 0 and the
            # overlap predicates are NULL for them anyway).
            bins = F.coalesce(bins, F.array(F.lit(-1).cast("long")))
        return df.withColumn(f"_bin_{side}", F.explode(bins))

    lb = binned(left, lc, ls, le, "l", keep_null=loose)
    rb = binned(right, rc, rs, re_, "r")
    cond = (
        (lb[lc] == rb[rc])
        & (lb["_bin_l"] == rb["_bin_r"])
        & (lb[ls] <= rb[re_])
        & (rb[rs] <= lb[le])
    )
    if strand is not None:
        lsc, rsc = strand_cols
        if strand == "same":
            cond = cond & lb[lsc].eqNullSafe(rb[rsc])
        else:
            flipped = F.when(rb[rsc] == "+", F.lit("-")).when(
                rb[rsc] == "-", F.lit("+")
            )
            cond = cond & (lb[lsc] == flipped)
    if min_frac_left is not None or min_frac_right is not None:
        for frac, name in ((min_frac_left, "min_frac_left"),
                           (min_frac_right, "min_frac_right")):
            if frac is not None and not (0 < frac <= 1):
                raise ValueError(f"{name} must be in (0, 1], got {frac!r}")
        ov = (
            F.least(lb[le].cast("long"), rb[re_].cast("long"))
            - F.greatest(lb[ls].cast("long"), rb[rs].cast("long"))
            + 1
        )
        checks = []
        if min_frac_left is not None:
            llen = lb[le].cast("long") - lb[ls].cast("long") + 1
            checks.append(ov >= min_frac_left * llen)
        if min_frac_right is not None:
            rlen = rb[re_].cast("long") - rb[rs].cast("long") + 1
            checks.append(ov >= min_frac_right * rlen)
        from functools import reduce as _reduce
        import operator as _op

        cond = cond & _reduce(_op.or_ if frac_either else _op.and_, checks)
    joined = lb.join(rb, cond, spark_how)
    # Dedup: emit the pair only from the first bin of its intersection.
    first_shared_bin = ((F.greatest(F.col(ls), F.col(rs)) - 1) / bin_size).cast("long")
    if not loose:
        return joined.filter(F.col("_bin_l") == first_shared_bin).drop("_bin_l", "_bin_r")
    left_first_bin = F.coalesce(
        ((F.col(ls) - 1) / bin_size).cast("long"), F.lit(-1).cast("long")
    )
    keep = F.when(
        F.col(rc).isNotNull(), F.col("_bin_l") == first_shared_bin
    ).otherwise(F.col("_bin_l") == left_first_bin)
    out = joined.filter(keep)
    if strict:
        # Drop a null-extended row when ITS left tuple matched anywhere:
        # per-id match counts over a (id, match-flag) projection — the
        # count side shuffles two narrow columns, the join-back hashes
        # one long key (the pre-r15 form windowed the full joined
        # payload over every left column as the partition key).
        counts = out.groupBy("_lid").agg(F.count(rb[rc]).alias("_nm"))
        out = (
            out.join(counts, on="_lid")
            .filter(rb[rc].isNotNull() | (F.col("_nm") == 0))
            .drop("_nm")
        )
    return out.drop("_bin_l", "_bin_r", "_lid")


def _row_id128(cols) -> F.Column:
    """128-bit row identity: two differently-salted xxhash64 passes in a
    struct (usable as a join/window/groupBy key). Distinct tuples
    colliding would be a SILENT wrong answer in the strict-outer dedup
    and the liftover fraction window; 2^64 leaves ~n^2/2^64 odds on
    billion-row inputs, 2^128 leaves none (ADVICE r15)."""
    return F.struct(
        F.xxhash64(*cols).alias("h1"),
        F.xxhash64(F.lit("hbs_lid2"), *cols).alias("h2"),
    )


def _with_dup_count(left: DataFrame) -> DataFrame:
    """Collapse exact duplicate left rows to one row + a ``_dupn`` count.

    The regroup operators (subtract/coverage/map) key their recombining
    groupBy on the whole left tuple, so duplicate input rows are
    indistinguishable inside the join — computing per DISTINCT tuple and
    re-emitting ``_dupn`` copies (:func:`_reemit_dups`) is what makes
    duplicated inputs legal: bedtools prints one output line per INPUT
    line, duplicates included, and per-tuple aggregates (counts, sums)
    must not double when the tuple appears twice. Costs one exchange of
    the left table keyed on its own columns; the join then sees fewer
    rows, so for duplicate-heavy inputs it is a net win.
    """
    if "_dupn" in left.columns or "_dup_i" in left.columns:
        raise ValueError(
            "left table may not carry reserved columns _dupn/_dup_i"
        )
    return left.groupBy(*left.columns).agg(F.count(F.lit(1)).alias("_dupn"))


def _reemit_dups(df: DataFrame) -> DataFrame:
    """Re-emit every row ``_dupn`` times (inverse of :func:`_with_dup_count`)
    and drop the count — map-side explode, no shuffle."""
    return df.withColumn(
        "_dup_i", F.explode(F.sequence(F.lit(1).cast("long"), F.col("_dupn")))
    ).drop("_dupn", "_dup_i")


#: default sub-contig range-chunk width for the two-phase merge sweep.
#: 8 Mb → ~30 chunks per human chromosome, so the local-merge stage runs
#: at (contigs × chunks)-way parallelism instead of capping at #contigs.
MERGE_CHUNK_SIZE = 8 << 20


def _chunked_local_merge(
    df: DataFrame,
    keys: Sequence[str],
    gap: int,
    chunk_size: int | None,
    carry_rows: bool,
):
    """Shared phase-1 + stitch-map machinery of :func:`interval_merge` and
    :func:`interval_cluster`.

    Phase 1 — local merge: every interval lands in the range chunk of its
    START (``floor((start-1)/chunk_size)``); a window partitioned by
    (contig, chunk) runs the classic running-max-stop sweep, producing
    local runs. Parallelism = #(contig, chunk) — scales with data volume,
    not with #contigs.

    Phase 2 — stitch map, entirely at CHUNK granularity (one row per
    non-empty chunk, i.e. ≤ genome_size/chunk_size rows — tiny): per
    chunk, aggregate ``max stop`` and ``max run start``; a per-contig
    window over these summaries yields ``reach`` (exclusive prefix max of
    chunk max-stops = how far earlier chunks extend into this one).

    Correctness hinges on three provable facts (closed intervals, merge
    rule ``next.start <= prev_max_stop + 1 + gap``):

    - at most ONE merged region crosses any chunk boundary (two regions
      both reaching past a boundary would overlap each other);
    - within a chunk, the runs absorbed into that crossing region are
      exactly those with ``run_start <= reach + 1 + gap`` — a PREFIX of
      the chunk's runs (run starts increase; local merge already
      guarantees consecutive local runs are further than gap apart, so
      absorbing one run never extends the frontier enough to absorb the
      next);
    - the crossing region's ORIGIN is the most recent non-absorbed run in
      any earlier chunk (each non-absorbed run opens a region, closing the
      previous one), and "the last non-absorbed run of chunk j" is its
      last run unless the whole chunk was absorbed — so the origin
      propagates with one ignore-nulls ``last`` window over the chunk
      summaries.

    Returns ``(runs, base)`` where ``runs`` has one row per local run with
    ``(c, _chunk, _grp, s, e, _rs, _re, n_merged, _origin)`` — ``_origin``
    is the long start coordinate of the run's final merged region, unique
    per region within a contig — and ``base`` is the chunk-annotated input
    (only when ``carry_rows``, for :func:`interval_cluster`).

    ``chunk_size=None`` (r16) is ADAPTIVE, same policy as
    ``sweep.resolve_chunk_size``: a small input by Catalyst plan stats
    runs as ONE chunk per contig — the local window IS the whole merge,
    every run is non-absorbed with its own origin, and the
    chunk-summary/stitch stages leave the plan entirely (the classic
    single-window form, which beats the decomposition until the data
    out-scales #contigs-way parallelism). Explicit ints force a chunk
    width; ``sweep.SINGLE_WINDOW`` forces the single-chunk form.
    """
    from pyspark.sql import Window

    from hadoop_bam_spark.operators.sweep import (
        SINGLE_WINDOW,
        resolve_chunk_size,
    )

    chunk_size = resolve_chunk_size(df, chunk_size, MERGE_CHUNK_SIZE, [keys[0]])
    single = chunk_size == SINGLE_WINDOW
    c, s, e = keys
    sl = F.col(s).cast("long")
    el = F.col(e).cast("long")
    cols = list(df.columns) if carry_rows else [c, s, e]
    base = df.select(
        *cols,
        sl.alias("_sl"),
        el.alias("_el"),
        (
            F.lit(0).cast("long")
            if single
            else F.floor((sl - 1) / F.lit(chunk_size)).cast("long")
        ).alias("_chunk"),
    )
    w = Window.partitionBy(c, "_chunk").orderBy("_sl", "_el")
    prev_max = F.max("_el").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max.isNull() | (F.col("_sl") > prev_max + 1 + gap), 1
    ).otherwise(0)
    grp = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    base = base.withColumn("_grp", grp)
    # groupBy keys ⊇ the window partition keys → no extra exchange.
    runs = base.groupBy(c, "_chunk", "_grp").agg(
        F.min(s).alias(s),
        F.max(e).alias(e),
        F.min("_sl").alias("_rs"),
        F.max("_el").alias("_re"),
        F.count(F.lit(1)).alias("n_merged"),
    )
    if single:
        # one chunk per contig: the local merge IS the whole merge — no
        # run can be absorbed by an earlier chunk, every run is a final
        # region, so the summary/stitch machinery leaves the plan
        runs = runs.withColumn("_absorbed", F.lit(False)).withColumn(
            "_origin", F.col("_rs")
        )
        return runs, (base if carry_rows else None)
    # Explicit reuse boundary (r15): `runs` feeds both the chunk-summary
    # branch and the stitch-join probe (and the absorbed/non-absorbed
    # branches in interval_merge above it). Without an Exchange here
    # every branch re-executes the data-sized sort+window+agg sweep;
    # with it they all read ONE shuffle (ReusedExchange) and the heavy
    # sweep runs once. Costs one shuffle of the (already locally merged)
    # runs — measured net win from 2M rows up even when nothing merges
    # (STRESS_INTERVAL r15), and the win grows with the fan-out.
    runs = runs.repartition(F.col(c), F.col("_chunk"))
    # Chunk summaries: ≤ one row per (contig, chunk). The per-contig
    # windows below run over THIS table, not the data — the only
    # contig-serial stage left, and it is O(#chunks).
    cs = runs.groupBy(c, "_chunk").agg(
        F.max("_re").alias("_cms"), F.max("_rs").alias("_cls")
    )
    wc = Window.partitionBy(c).orderBy("_chunk")
    reach = F.max("_cms").over(wc.rowsBetween(Window.unboundedPreceding, -1))
    cs = cs.select(c, "_chunk", "_cls", reach.alias("_reach"))
    # Last non-absorbed run IN each chunk: its last run, unless even that
    # was absorbed (then the whole chunk was — absorbed runs are a prefix).
    lna_local = F.when(
        F.col("_reach").isNull() | (F.col("_cls") > F.col("_reach") + 1 + gap),
        F.col("_cls"),
    )
    cs = cs.withColumn("_lnal", lna_local)
    lna = F.last("_lnal", ignorenulls=True).over(
        wc.rowsBetween(Window.unboundedPreceding, -1)
    )
    stitch = cs.select(c, "_chunk", "_reach", lna.alias("_lna"))
    runs = runs.join(F.broadcast(stitch), on=[c, "_chunk"], how="left")
    absorbed = F.col("_reach").isNotNull() & (
        F.col("_rs") <= F.col("_reach") + 1 + gap
    )
    runs = (
        runs.withColumn("_absorbed", absorbed)
        .withColumn(
            "_origin",
            F.when(F.col("_absorbed"), F.col("_lna")).otherwise(F.col("_rs")),
        )
        .drop("_reach", "_lna")
    )
    return runs, (base if carry_rows else None)


def interval_merge(
    df: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    gap: int = 0,
    chunk_size: int | None = None,
) -> DataFrame:
    """Flatten overlapping (and book-ended) intervals per contig — the
    bedtools-merge operation. Returns one row per merged region:
    ``(contig, start, stop, n_merged)``.

    Two 1-based closed intervals merge when the next one starts at or
    before ``previous max stop + 1 + gap`` (``gap=0`` merges
    overlapping AND adjacent intervals, the bedtools default; a larger
    gap closes small holes, e.g. blocklist smoothing).

    Scale shape: TWO-PHASE range-partitioned sweep (see
    :func:`_chunked_local_merge`) — a local running-max merge per
    (contig, ``chunk_size``-wide range chunk), then a chunk-granularity
    stitch map (per-contig windows over ONE ROW PER CHUNK) that assigns
    every local run its final region origin. ONE data shuffle total: a
    non-absorbed run IS a final region (its origin is itself), so the
    recombination is a broadcast join against the aggregated ABSORBED
    runs — and the absorbed aggregate is provably chunk-bounded (each
    chunk boundary is crossed by at most one region, so there are at
    most #chunks crossing regions per contig), i.e. always
    broadcastable. No stage is limited to #contigs-way parallelism: at
    100 TB of intervals on 1000 cores the sweep runs at
    #(contig, chunk) ≈ genome/8 Mb ≫ #cores partitions, where the old
    single-window form idled 97% of the cluster through a ~24-way
    per-contig stage.
    """
    from hadoop_bam_spark.operators.sweep import (
        SINGLE_WINDOW,
        resolve_chunk_size,
    )

    c, s, e = keys
    # resolve here too (not just inside _chunked_local_merge): the
    # single-window form also drops THIS function's recombination stages
    chunk_size = resolve_chunk_size(df, chunk_size, MERGE_CHUNK_SIZE, [c])
    if chunk_size == SINGLE_WINDOW:
        # dedicated small-input plan: the classic one-window merge with
        # ordering/arithmetic on inline cast EXPRESSIONS — materializing
        # _sl/_el/_chunk columns like the shared machinery does would
        # push two extra longs through the exchange+sort for nothing
        # (measured +40% on a 2M-row merge vs this form)
        from pyspark.sql import Window

        sl = F.col(s).cast("long")
        el = F.col(e).cast("long")
        w = Window.partitionBy(c).orderBy(sl, el)
        prev_max = F.max(el).over(w.rowsBetween(Window.unboundedPreceding, -1))
        opens = F.when(
            prev_max.isNull() | (sl > prev_max + 1 + gap), 1
        ).otherwise(0)
        grp = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
        return (
            df.select(c, s, e)
            .withColumn("_grp", grp)
            .groupBy(c, "_grp")
            .agg(
                F.min(s).alias(s),
                F.max(e).alias(e),
                F.count(F.lit(1)).alias("n_merged"),
            )
            .drop("_grp")
        )
    runs, _ = _chunked_local_merge(df, keys, gap, chunk_size, carry_rows=False)
    # Second reuse boundary: the post-stitch runs feed the absorbed
    # aggregate AND the non-absorbed output — one more narrow shuffle so
    # the stitch join executes once instead of per branch.
    runs = runs.repartition(F.col(c), F.col("_chunk"))
    ab = (
        runs.filter(F.col("_absorbed"))
        .groupBy(c, "_origin")
        .agg(F.max("_re").alias("_ab_re"), F.sum("n_merged").alias("_ab_n"))
    )
    stop_t = df.schema[e].dataType
    combined_stop = F.when(
        F.col("_ab_re").isNull(), F.col(e)
    ).otherwise(
        F.greatest(F.col(e).cast("long"), F.col("_ab_re")).cast(stop_t)
    )
    return (
        runs.filter(~F.col("_absorbed"))
        .withColumnRenamed("_origin", "_o")
        .join(
            F.broadcast(ab.withColumnRenamed("_origin", "_o")),
            on=[c, "_o"],
            how="left",
        )
        .select(
            F.col(c),
            F.col(s),
            combined_stop.alias(e),
            (
                F.col("n_merged") + F.coalesce(F.col("_ab_n"), F.lit(0))
            ).alias("n_merged"),
        )
    )


def interval_subtract(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] | None = None,
    bin_size: int = 16384,
) -> DataFrame:
    """Remove every right region from each left interval — the bedtools
    subtract operation. Returns the left rows with (start, stop) replaced
    by the surviving sub-segments; an interval wholly covered by the right
    set disappears, an untouched one passes through whole, and a mid-hit
    one splits into several rows.

    Duplicate left tuples are supported (r16): exact duplicates collapse
    to one row + a count before the join and re-emit per input row after
    the regroup, so the output has one line-set per INPUT line like
    bedtools subtract.

    Scale shape: merge the right side once (the two-phase chunked
    sweep), LOOSE-LEFT-OUTER binned overlap join left x merged-right
    (equi-join on 16 kb tiles —
    the large-by-large path, no broadcast assumption; untouched left rows
    survive as one null-extended row, so no second join against the left
    table is ever needed), clip + collect the disjoint covering regions
    per left row (bounded by that row's pileup, the same unit every
    interval tool carries), then pure array expressions emit the gaps.
    The left table's text/payload columns ride along; only (contig,
    start, stop) and the clip structs shuffle twice (join + regroup).
    """
    c, s, e = keys
    rk = right_keys or keys
    left = _with_dup_count(left)
    mr = interval_merge(right, keys=rk).select(
        F.col(rk[0]).alias("_mc"),
        F.col(rk[1]).cast("long").alias("_ms"),
        F.col(rk[2]).cast("long").alias("_me"),
    )
    hits = interval_join_binned(
        left, mr, left_keys=keys, right_keys=("_mc", "_ms", "_me"),
        bin_size=bin_size, how="left_outer_loose",
    )
    clip = F.when(
        F.col("_mc").isNotNull(),
        F.struct(
            F.greatest(F.col("_ms"), F.col(s).cast("long")).alias("cs"),
            F.least(F.col("_me"), F.col(e).cast("long")).alias("ce"),
        ),
    )
    joined = (
        hits.select(*left.columns, clip.alias("_clip"))
        .groupBy(*left.columns)
        .agg(F.sort_array(F.collect_list("_clip")).alias("_cov"))
    )
    # Sentinel walk: a fake covering block just before the interval and one
    # just after turn "gaps between covering blocks" into exactly the
    # surviving segments (untouched rows fall out as one whole segment).
    lo = (F.col(s).cast("long") - 1)
    hi = (F.col(e).cast("long") + 1)
    bounds = F.concat(
        F.array(F.struct(lo.alias("cs"), lo.alias("ce"))),
        F.coalesce(
            F.col("_cov"),
            F.array().cast("array<struct<cs:bigint,ce:bigint>>"),
        ),
        F.array(F.struct(hi.alias("cs"), hi.alias("ce"))),
    )
    n = F.size(bounds)
    segs = F.filter(
        F.zip_with(
            F.slice(bounds, F.lit(1), n - 1),
            F.slice(bounds, F.lit(2), n - 1),
            lambda a, b: F.struct(
                (a["ce"] + 1).alias("seg_start"), (b["cs"] - 1).alias("seg_stop")
            ),
        ),
        lambda x: x["seg_start"] <= x["seg_stop"],
    )
    carry = [col for col in left.columns if col not in (s, e)]
    return _reemit_dups(
        joined.select(*carry, F.explode(segs).alias("_seg"))
        .select(*carry, F.col("_seg.seg_start").alias(s), F.col("_seg.seg_stop").alias(e))
    )


def interval_complement(
    df: DataFrame,
    sizes: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
) -> DataFrame:
    """Regions of the genome NOT covered by any interval — bedtools
    complement. ``sizes`` is a (contig, size) frame (the .fai analog,
    reference FastaSequenceIndex / faidx sidecar); a contig present in
    ``sizes`` with no intervals at all yields one full-length gap.
    ``sizes`` is the universe declaration: intervals on contigs it does
    NOT list are ignored, and intervals extending past a declared size
    are clamped to it — so no emitted gap can name a position that does
    not exist (bedtools complement errors on both shapes; clamping keeps
    the operator total on dirty inputs while never inventing positions).

    Scale shape: one interval_merge (itself the two-phase chunked
    sweep), then the chunked next-region lookahead (operators/sweep.py)
    over the MERGED regions for the between-gaps — merged output is
    usually tiny, but when nothing merges it is data-sized, so it gets
    no per-contig window either — plus ONE tiny per-contig aggregate
    (min start + max stop in the same pass, r15; was two) joined to
    ``sizes``: the head gap and the tail gap explode out of one array,
    and a contig with no intervals at all falls out as a full-length
    tail gap.
    """
    from hadoop_bam_spark.operators.sweep import chunked_lead_pos

    c, s, e = keys
    sz = sizes.select(F.col(sizes.columns[0]).alias(c),
                      F.col(sizes.columns[1]).cast("long").alias("_size"))
    m = (
        interval_merge(df, keys=keys)
        .join(F.broadcast(sz), on=c)
        .filter(F.col(s).cast("long") <= F.col("_size"))
        .select(
            F.col(c),
            F.col(s).cast("long").alias(s),
            F.least(F.col(e).cast("long"), F.col("_size")).alias(e),
        )
    )
    between = (
        chunked_lead_pos(m, [c], s, out="_next_start")
        .filter(F.col("_next_start").isNotNull())
        .select(
            F.col(c),
            (F.col(e) + 1).alias("_gs"),
            (F.col("_next_start") - 1).alias("_ge"),
        )
        .filter(F.col("_gs") <= F.col("_ge"))
    )
    ext = sz.join(
        m.groupBy(c).agg(
            F.min(s).alias("_first"),
            F.max(F.col(e).cast("long")).alias("_maxstop"),
        ),
        on=c, how="left",
    )
    # Head + tail gaps from the one aggregate: a contig with no intervals
    # has _first null (head drops via the null bound) and its tail gap is
    # the whole contig.
    gaps = F.filter(
        F.array(
            F.struct(
                F.lit(1).cast("long").alias("gs"),
                (F.col("_first") - 1).alias("ge"),
            ),
            F.struct(
                (F.coalesce("_maxstop", F.lit(0)) + 1).alias("gs"),
                F.col("_size").alias("ge"),
            ),
        ),
        lambda x: x["gs"].isNotNull()
        & x["ge"].isNotNull()
        & (x["gs"] <= x["ge"]),
    )
    headtail = ext.select(F.col(c), F.explode(gaps).alias("_g")).select(
        F.col(c), F.col("_g.gs").alias("_gs"), F.col("_g.ge").alias("_ge")
    )
    return between.unionByName(headtail).select(
        F.col(c), F.col("_gs").alias(s), F.col("_ge").alias(e)
    )


def interval_closest(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] | None = None,
    chunk_size: int | None = None,
    report_right: bool = False,
    ignore_overlaps: bool = False,
    ignore_upstream: bool = False,
    ignore_downstream: bool = False,
    signed: bool = False,
    strand: str | None = None,
    strand_cols: Sequence[str] = ("strand", "strand"),
) -> DataFrame:
    """Distance from each left interval to its nearest right interval —
    the bedtools closest distance (0 when any right interval overlaps,
    NULL when the contig has no right intervals at all). Returns the left
    rows plus a ``closest_dist`` column. Duplicate left tuples are
    supported (r16): each copy contributes one start event to the fused
    scan, so the recombining regroup counts copies for free
    (``sum(_t = 1)``) and re-emits one output row per INPUT row, like
    bedtools — no extra pass, no extra shuffle.

    ``strand`` (r16): ``"same"`` (bedtools -s) restricts candidates to
    rights whose strand EQUALS the left row's strand; ``"opposite"``
    (-S) to rights on the flipped strand ('+' <-> '-').
    ``strand_cols=(left_col, right_col)`` names the two strand columns.
    Scale shape: strand-awareness is purely a PARTITIONING refinement —
    the fused scan's partition key widens from (contig) to
    (contig, strand group), where left events carry their own strand
    and right events carry theirs (same) or its flip (opposite). Same
    single pass, same event frame, no extra shuffle; a left row whose
    strand group holds no rights gets NULL distance exactly like an
    empty contig. Null/'.' strands: literal null-safe equality under
    ``"same"`` (null matches null); under ``"opposite"`` a right with a
    strand outside {{'+','-'}} can never match and is dropped map-side.

    ``report_right=True`` additionally emits the nearest right
    interval's coordinates (``closest_start``/``closest_stop``, null
    when the contig has no rights) — what bedtools closest actually
    prints. ONE deterministic winner per left row (bedtools -t first
    rather than -t all): on an overlap, the overlapping right with the
    largest stop (ties: largest start); otherwise the nearer flank,
    preferring the upstream one on an exact distance tie — the flank
    candidates themselves resolve ties by (max stop, max start)
    upstream and (min start, min stop) downstream. The candidates ride
    the SAME fused scan as the distances (the running max/min carries a
    (key, other-coordinate) struct instead of a bare long), so the
    reporting form costs no extra pass.

    TIE-RULE PARITY CAVEAT: bedtools ``-t first`` picks the first tied B
    feature in SORTED order, i.e. min (start, stop). The scan's overlap
    detection is the running max of stops among rights with
    start <= left.stop — an argmax that CANNOT simultaneously select the
    min-(start, stop) overlapping right (that is a 2-D dominance query,
    not a running aggregate), so on ties THIS operator's winner can
    differ from bedtools' while the distance is identical. The rules
    above are deterministic and oracle-gated; see OPERATORS.md.

    bedtools closest option mapping (r16):

    - ``ignore_overlaps`` (bedtools -io): overlapping rights are ignored
      entirely — the flank scans switch to STRICT frames (preceding:
      stop < left.start, following: start > left.stop; the inclusive
      frames would admit a touching right, which overlaps under closed
      intervals) and the overlap branch is dropped from the plan.
    - ``ignore_upstream`` / ``ignore_downstream`` (bedtools -iu / -id
      with -D ref): drop the lower-coordinate / higher-coordinate flank
      candidate (its scan leaves the plan); overlapping rights still
      match unless ``ignore_overlaps``. Both at once is rejected.
    - ``signed`` (bedtools -D ref): ``closest_dist`` is reported
      negative when the winner is upstream (lower coordinates), 0 on
      overlap, positive downstream.

    A left row whose every candidate is ignored gets NULL distance (and
    NULL report columns), same as an empty contig.

    Scale shape: the sort-merge sweep expressed as ONE fused chunked
    scan (operators/sweep.py chunked_scan) over a single event frame —
    each side explodes map-side into two event rows, so each input is
    scanned once:

    - right events at coord=stop carry the stop (running asc max =
      nearest PRECEDING region), right events at coord=start carry the
      stop (running asc max = OVERLAP detection: max stop among rights
      with start <= left.stop) and the start (running desc min =
      nearest FOLLOWING region);
    - left events at coord=start read the preceding scan, left events
      at coord=stop read the overlap + following scans.

    All three running aggregates share one RANGE-frame window pass —
    one exchange + one sort for the whole sweep, local per (contig,
    8 Mb range chunk) with chunk-granularity offsets, so no stage is
    limited to #contigs-way parallelism. One regroup on the left tuple
    recombines the two left event rows. Nothing is ever all-pairs.
    """
    from hadoop_bam_spark.operators.sweep import chunked_scan

    if ignore_upstream and ignore_downstream:
        raise ValueError(
            "ignore_upstream and ignore_downstream cannot both be set "
            "(no candidate could ever match, like bedtools -iu -id)"
        )
    if strand not in (None, "same", "opposite"):
        raise ValueError(
            "strand must be None, 'same' (bedtools -s) or 'opposite' (-S)"
        )
    need_prev = not ignore_upstream
    need_next = not ignore_downstream
    need_ov = not ignore_overlaps
    cs_kw = {"chunk_size": chunk_size}
    c, s, e = keys
    rk = right_keys or keys
    part_cols = ["_c"]
    g_r: list = []
    g_l: list = []
    g_c: list = []
    if strand is not None:
        ls_col, rs_col = strand_cols
        r_strand = F.col(rs_col)
        if strand == "opposite":
            r_grp = F.when(r_strand == "+", F.lit("-")).when(
                r_strand == "-", F.lit("+")
            )
            # a right outside {+,-} can never match any left: drop map-side
            right = right.filter(r_grp.isNotNull())
        else:
            r_grp = r_strand
        g_r = [r_grp.alias("_g")]
        g_l = [F.col(ls_col).alias("_g")]
        g_c = ["_g"]
        part_cols = ["_c", "_g"]
    if "_dupn" in left.columns or "_dup_i" in left.columns:
        raise ValueError(
            "left table may not carry reserved columns _dupn/_dup_i"
        )
    lrow = F.struct(*[F.col(col) for col in left.columns]).alias("_row")
    row_t = left.select(lrow).schema["_row"].dataType
    rs_l = F.col(rk[1]).cast("long")
    re_l = F.col(rk[2]).cast("long")
    if report_right:
        # candidates carry (scan key, the other coordinate): the running
        # max/min then ALSO selects the winning right interval, with the
        # struct's lexicographic order as the documented tie rule
        cand_t = "struct<k:bigint,o:bigint>"
        cp_cand = F.struct(re_l.alias("k"), rs_l.alias("o"))
        co_cand = F.struct(re_l.alias("k"), rs_l.alias("o"))
        cn_cand = F.struct(rs_l.alias("k"), re_l.alias("o"))
    else:
        cand_t = "bigint"
        cp_cand, co_cand, cn_cand = re_l, re_l, rs_l
    nl = F.lit(None).cast("long")
    nlc = F.lit(None).cast(cand_t)

    def _key(col):
        return col.getField("k") if report_right else col

    # Each side explodes to its two event kinds in one scan: _cp feeds
    # the preceding-stop prefix max, _co the overlap max, _cn the
    # following-start suffix min. Left rows contribute NULL to every
    # candidate, so tie rows at one coordinate are transparent (the
    # range frames include rights at the same coordinate — stop==start
    # boundary cases count as adjacent/overlapping exactly as before).
    r_ev = right.select(
        F.col(rk[0]).alias("_c"),
        *g_r,
        F.explode(
            F.array(
                F.struct(
                    re_l.alias("coord"),
                    cp_cand.alias("cp"),
                    nlc.alias("co"),
                    nlc.alias("cn"),
                ),
                F.struct(
                    rs_l.alias("coord"),
                    nlc.alias("cp"),
                    co_cand.alias("co"),
                    cn_cand.alias("cn"),
                ),
            )
        ).alias("_ev"),
    ).select(
        "_c",
        *g_c,
        F.col("_ev.coord").alias("_coord"),
        F.col("_ev.cp").alias("_cp"),
        F.col("_ev.co").alias("_co"),
        F.col("_ev.cn").alias("_cn"),
        F.lit(0).alias("_t"),
        F.lit(None).cast(row_t).alias("_row"),
        nl.alias("_ls"),
        nl.alias("_le"),
    )
    l_ev = left.select(
        F.col(c).alias("_c"),
        *g_l,
        F.col(s).cast("long").alias("_ls"),
        F.col(e).cast("long").alias("_le"),
        lrow,
    ).select(
        "_c",
        *g_c,
        F.explode(
            F.array(
                F.struct(F.col("_ls").alias("coord"), F.lit(1).alias("t")),
                F.struct(F.col("_le").alias("coord"), F.lit(2).alias("t")),
            )
        ).alias("_ev"),
        "_row",
        "_ls",
        "_le",
    ).select(
        "_c",
        *g_c,
        F.col("_ev.coord").alias("_coord"),
        nlc.alias("_cp"),
        nlc.alias("_co"),
        nlc.alias("_cn"),
        F.col("_ev.t").alias("_t"),
        "_row",
        "_ls",
        "_le",
    )
    # ignored directions/overlaps drop their scan spec from the plan
    # entirely; -io flips the flank frames to STRICT (the inclusive
    # frames would admit a touching right, which overlaps under closed
    # intervals).
    specs = []
    if need_prev:
        specs.append(("_cp", "max", "_prev_stop", "asc", ignore_overlaps))
    if need_ov:
        specs.append(("_co", "max", "_ov_stop", "asc"))
    if need_next:
        specs.append(("_cn", "min", "_next_start", "desc", ignore_overlaps))
    scanned = chunked_scan(
        r_ev.unionByName(l_ev), part_cols, "_coord", specs, **cs_kw
    )
    no_long = F.max(F.lit(None).cast("long"))
    aggs = [
        (
            F.max(
                F.when(
                    F.col("_t") == 1, F.col("_ls") - _key(F.col("_prev_stop"))
                )
            )
            if need_prev
            else no_long
        ).alias("_d_prev"),
        (
            F.max(
                F.when(F.col("_t") == 2, _key(F.col("_ov_stop")) >= F.col("_ls"))
            )
            if need_ov
            else F.max(F.lit(None).cast("boolean"))
        ).alias("_overlaps"),
        (
            F.max(
                F.when(
                    F.col("_t") == 2, _key(F.col("_next_start")) - F.col("_le")
                )
            )
            if need_next
            else no_long
        ).alias("_d_next"),
        # one start event per input COPY -> the duplicate count rides the
        # regroup for free (supports duplicated left rows, bedtools-style
        # one output line per input line)
        F.sum(F.when(F.col("_t") == 1, 1).otherwise(0)).alias("_dupn"),
    ]
    if report_right:
        no_cand = F.max(F.lit(None).cast(cand_t))
        aggs += [
            (
                F.max(F.when(F.col("_t") == 1, F.col("_prev_stop")))
                if need_prev
                else no_cand
            ).alias("_pc"),
            (
                F.max(F.when(F.col("_t") == 2, F.col("_ov_stop")))
                if need_ov
                else no_cand
            ).alias("_oc"),
            (
                F.max(F.when(F.col("_t") == 2, F.col("_next_start")))
                if need_next
                else no_cand
            ).alias("_nc"),
        ]
    per_row = scanned.filter(F.col("_t") >= 1).groupBy("_row").agg(*aggs)
    prev_wins = F.col("_d_prev").isNotNull() & (
        F.col("_d_next").isNull() | (F.col("_d_prev") <= F.col("_d_next"))
    )
    unsigned = F.least(
        F.coalesce(F.col("_d_prev"), F.col("_d_next")),
        F.coalesce(F.col("_d_next"), F.col("_d_prev")),
    )
    flank = (
        F.when(prev_wins, -unsigned).otherwise(unsigned) if signed else unsigned
    )
    dist = F.when(
        F.coalesce(F.col("_overlaps"), F.lit(False)), F.lit(0).cast("long")
    ).otherwise(flank)
    out = [F.col("_row.*"), dist.alias("closest_dist")]
    if report_right:
        # winner: the overlap candidate when overlapping; else the nearer
        # flank, preferring upstream on an exact tie. Candidate structs:
        # _pc/_oc = (stop, start), _nc = (start, stop).
        prev_w = F.struct(
            F.col("_pc.o").alias("cs"), F.col("_pc.k").alias("ce")
        )
        next_w = F.struct(
            F.col("_nc.k").alias("cs"), F.col("_nc.o").alias("ce")
        )
        winner = F.when(
            F.coalesce(F.col("_overlaps"), F.lit(False)),
            F.struct(F.col("_oc.o").alias("cs"), F.col("_oc.k").alias("ce")),
        ).when(
            F.col("_d_prev").isNotNull()
            & (F.col("_d_next").isNull() | (F.col("_d_prev") <= F.col("_d_next"))),
            prev_w,
        ).when(F.col("_d_next").isNotNull(), next_w)
        out += [
            winner.getField("cs").alias("closest_start"),
            winner.getField("ce").alias("closest_stop"),
        ]
    return _reemit_dups(per_row.select(*out, F.col("_dupn")))


def interval_closest_all(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] | None = None,
    chunk_size: int | None = None,
    ignore_overlaps: bool = False,
    ignore_upstream: bool = False,
    ignore_downstream: bool = False,
    signed: bool = False,
    strand: str | None = None,
    strand_cols: Sequence[str] = ("strand", "strand"),
    bin_size: int = 16384,
) -> DataFrame:
    """bedtools closest ``-t all`` — its DEFAULT tie mode: one output row
    per left row PER tied-closest right feature (every overlapping right
    when anything overlaps, otherwise every flank right at exactly the
    winning distance, both sides on an exact distance tie). Returns the
    left rows plus ``closest_dist`` / ``closest_start`` / ``closest_stop``;
    a left row with no candidate at all survives as one null-extended
    row. The ``-io``/``-iu``/``-id``/``-D`` options compose exactly as in
    :func:`interval_closest`, and so do ``strand``/``strand_cols``
    (bedtools -s / -S): the base scan partitions by (contig, strand
    group), the dist-0 expansion keys its tile join on a composite
    (contig, group) string, and the flank equi-joins add a null-safe
    group equality — no extra pass anywhere.

    Scale shape: :func:`interval_closest`'s fused scan computes the
    winning distance per left row (one pass, never all-pairs), then the
    tie EXPANSION is cheap because distance-0 and distance-d ties have
    closed forms: dist 0 <=> overlap (the binned tile join), and a flank
    tie at dist d > 0 means the right's stop is EXACTLY ``start - d``
    (upstream) or its start is ``stop + d`` (downstream) — two hash
    EQUI-joins on (contig, boundary coordinate), no range predicate, no
    fan-out beyond the true tie multiplicity. A dist-0 flank is
    impossible (a right touching the left overlaps it under closed
    intervals), so the three parts partition cleanly.
    """
    c, s, e = keys
    rk = right_keys or keys
    base = interval_closest(
        left,
        right,
        keys=keys,
        right_keys=rk,
        chunk_size=chunk_size,
        ignore_overlaps=ignore_overlaps,
        ignore_upstream=ignore_upstream,
        ignore_downstream=ignore_downstream,
        signed=False,
        strand=strand,
        strand_cols=strand_cols,
    )
    lcols = [col for col in base.columns if col != "closest_dist"]
    r_grp_cols: list = []
    if strand is not None:
        ls_col, rs_col = strand_cols
        r_strand = F.col(rs_col)
        if strand == "opposite":
            r_grp = F.when(r_strand == "+", F.lit("-")).when(
                r_strand == "-", F.lit("+")
            )
            right = right.filter(r_grp.isNotNull())
        else:
            r_grp = r_strand
        r_grp_cols = [r_grp.alias("_rg")]
    r = right.select(
        F.col(rk[0]).alias("_rc"),
        F.col(rk[1]).cast("long").alias("_rs"),
        F.col(rk[2]).cast("long").alias("_re"),
        *r_grp_cols,
    )
    grp_match = (
        F.col(ls_col).eqNullSafe(F.col("_rg"))
        if strand is not None
        else F.lit(True)
    )
    zero = F.lit(0).cast("long")
    d = F.col("closest_dist")
    parts = []
    if not ignore_overlaps:
        # strand-aware tile join: fold the strand group into a composite
        # contig key on BOTH sides. Struct key, not concat_ws (r18, ADVICE
        # r16 low / VERDICT r17 #9): struct equality compares fields
        # null-first, so NULL strands match themselves AND a contig whose
        # name happens to contain the old "\x1f" separator can no longer
        # collide with a (contig, strand) pair — the same null-safe
        # pattern sweep's _swkey proved in r17.
        if strand is not None:
            bl = base.filter(d == 0).withColumn(
                "_ck",
                F.struct(
                    F.col(c).cast("string").alias("c"),
                    F.col(ls_col).cast("string").alias("g"),
                ),
            )
            br = r.withColumn(
                "_ck",
                F.struct(
                    F.col("_rc").cast("string").alias("c"),
                    F.col("_rg").cast("string").alias("g"),
                ),
            )
            ov = interval_join_binned(
                bl,
                br,
                left_keys=("_ck", s, e),
                right_keys=("_ck", "_rs", "_re"),
                bin_size=bin_size,
            )
        else:
            ov = interval_join_binned(
                base.filter(d == 0),
                r,
                left_keys=keys,
                right_keys=("_rc", "_rs", "_re"),
                bin_size=bin_size,
            )
        parts.append(
            ov.select(
                *lcols,
                zero.alias("closest_dist"),
                F.col("_rs").alias("closest_start"),
                F.col("_re").alias("closest_stop"),
            )
        )
    flank = base.filter(d > 0)
    if not ignore_upstream:
        up = flank.join(
            r,
            (F.col(c) == F.col("_rc"))
            & (F.col("_re") == F.col(s).cast("long") - d)
            & grp_match,
            "inner",
        )
        parts.append(
            up.select(
                *lcols,
                ((-d) if signed else d).alias("closest_dist"),
                F.col("_rs").alias("closest_start"),
                F.col("_re").alias("closest_stop"),
            )
        )
    if not ignore_downstream:
        down = flank.join(
            r,
            (F.col(c) == F.col("_rc"))
            & (F.col("_rs") == F.col(e).cast("long") + d)
            & grp_match,
            "inner",
        )
        parts.append(
            down.select(
                *lcols,
                d.alias("closest_dist"),
                F.col("_rs").alias("closest_start"),
                F.col("_re").alias("closest_stop"),
            )
        )
    nl = F.lit(None).cast("long")
    parts.append(
        base.filter(d.isNull()).select(
            *lcols,
            nl.alias("closest_dist"),
            nl.alias("closest_start"),
            nl.alias("closest_stop"),
        )
    )
    from functools import reduce as _reduce

    return _reduce(lambda a, b: a.unionByName(b), parts)


def interval_coverage(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] | None = None,
    bin_size: int = 16384,
    strand: str | None = None,
    strand_cols: Sequence[str] = ("strand", "strand"),
) -> DataFrame:
    """Per left interval: how many right intervals overlap it, how many of
    its bases they cover, and the covered fraction — bedtools coverage.
    ``strand="same"``/``"opposite"`` (bedtools coverage -s / -S) counts
    only rights on the matching strand — passed straight through to the
    binned join's match definition, so zero-coverage rows (including
    wrong-strand-only ones) still survive the loose outer join.
    Returns the left rows plus (n_overlaps, covered_bases, interval_len,
    coverage_fraction). Duplicate left tuples are supported (r16): exact
    duplicates collapse to one row + a count before the join (so
    n_overlaps cannot double-count through the regroup) and re-emit per
    input row after it — one output line per input line, like bedtools.

    Scale shape: ONE LEFT-OUTER binned overlap join (large-by-large safe;
    zero-coverage left rows survive as one null-extended row, so no
    second join against the left table) + one regroup on the left tuple.
    Covered bases come from merging the CLIPPED right intervals per left
    row inside an array aggregate — the per-row list is bounded by that
    row's pileup, so no second shuffle and no pre-merge pass over the
    (possibly huge) right side.
    """
    c, s, e = keys
    rk = right_keys or keys
    out_cols = list(left.columns)
    left = _with_dup_count(left)
    str_kw = {}
    r_strand_cols = []
    if strand is not None:
        r_strand_cols = [F.col(strand_cols[1]).alias("_rg")]
        str_kw = {"strand": strand, "strand_cols": (strand_cols[0], "_rg")}
    r = right.select(
        F.col(rk[0]).alias("_rc"),
        F.col(rk[1]).cast("long").alias("_rs"),
        F.col(rk[2]).cast("long").alias("_re"),
        *r_strand_cols,
    )
    hits = interval_join_binned(
        left, r, left_keys=keys, right_keys=("_rc", "_rs", "_re"),
        bin_size=bin_size, how="left_outer_loose", **str_kw,
    )
    clip = F.when(
        F.col("_rc").isNotNull(),
        F.struct(
            F.greatest(F.col("_rs"), F.col(s).cast("long")).alias("cs"),
            F.least(F.col("_re"), F.col(e).cast("long")).alias("ce"),
        ),
    )
    merged_len = F.aggregate(
        F.sort_array(F.col("_clips")),
        F.struct(F.lit(0).cast("long").alias("cov"), F.lit(0).cast("long").alias("pe")),
        lambda acc, x: F.struct(
            (acc["cov"] + F.greatest(F.lit(0).cast("long"),
                                     x["ce"] - F.greatest(x["cs"] - 1, acc["pe"]))).alias("cov"),
            F.greatest(acc["pe"], x["ce"]).alias("pe"),
        ),
        lambda acc: acc["cov"],
    )
    out = (
        hits.select(*left.columns, clip.alias("_clip"))
        .groupBy(*left.columns)
        .agg(
            F.count("_clip").alias("n_overlaps"),
            F.collect_list("_clip").alias("_clips"),
        )
        .select(*left.columns, "n_overlaps", merged_len.alias("covered_bases"))
    )
    ilen = (F.col(e).cast("long") - F.col(s).cast("long") + 1)
    return _reemit_dups(
        out.select(
            *out_cols,
            "n_overlaps",
            "covered_bases",
            ilen.alias("interval_len"),
            (F.col("covered_bases") / ilen).alias("coverage_fraction"),
            "_dupn",
        )
    )


#: aggregate ops interval_map accepts: op -> aggregate builder
_MAP_OPS = {
    "sum": F.sum,
    "mean": F.mean,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "collect": lambda col: F.sort_array(F.collect_list(col)),
}


def interval_map(
    left: DataFrame,
    right: DataFrame,
    specs: Sequence[tuple],
    keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] | None = None,
    bin_size: int = 16384,
    strand: str | None = None,
    strand_cols: Sequence[str] = ("strand", "strand"),
) -> DataFrame:
    """Aggregate right-side values over each left interval — bedtools map:
    ``strand="same"``/``"opposite"`` (bedtools map -s / -S) aggregates
    only rights on the matching strand (passed through to the binned
    join's match definition; wrong-strand-only left rows keep their
    NULL aggregates / 0 counts like zero-match rows).
    for every left row, apply the requested aggregates to the chosen
    columns of the right rows that overlap it. ``specs`` is a sequence of
    ``(right_value_column, op, output_name)`` with op in
    sum/mean/min/max/count/count_distinct/collect (``collect`` returns the
    sorted value list, bedtools' ``collapse`` with a deterministic
    order). Left rows with no overlap survive with NULL aggregates
    (count ops yield 0) — bedtools' '.'. Duplicate left tuples are
    supported (r16, same mechanism as :func:`interval_coverage`):
    duplicates collapse to one row + a count before the join — so sums
    and counts cannot double through the regroup — and re-emit per input
    row after it.

    Scale shape: ONE loose-left-outer binned overlap join (large-by-large
    safe; zero-match left rows survive as a null-extended row, so no
    second join against the left table) + one regroup on the left tuple.
    Per-left-row cost is bounded by that row's pileup — the operator's
    inherent unit. Loose extra null rows contribute nothing: every
    aggregate here ignores NULL inputs.
    """
    for _, op, _ in specs:
        if op not in _MAP_OPS:
            raise ValueError(
                f"unsupported interval_map op {op!r} "
                f"(have {sorted(_MAP_OPS)})"
            )
    rk = right_keys or keys
    left = _with_dup_count(left)
    vcols = sorted({v for v, _, _ in specs})
    str_kw = {}
    r_strand_cols = []
    if strand is not None:
        r_strand_cols = [F.col(strand_cols[1]).alias("_rg")]
        str_kw = {"strand": strand, "strand_cols": (strand_cols[0], "_rg")}
    r = right.select(
        F.col(rk[0]).alias("_rc"),
        F.col(rk[1]).cast("long").alias("_rs"),
        F.col(rk[2]).cast("long").alias("_re"),
        *[F.col(v).alias(f"_v_{v}") for v in vcols],
        *r_strand_cols,
    )
    hits = interval_join_binned(
        left, r, left_keys=keys, right_keys=("_rc", "_rs", "_re"),
        bin_size=bin_size, how="left_outer_loose", **str_kw,
    )
    aggs = [
        _MAP_OPS[op](F.col(f"_v_{v}")).alias(out) for v, op, out in specs
    ]
    return _reemit_dups(hits.groupBy(*left.columns).agg(*aggs))


def interval_jaccard(
    a: DataFrame,
    b: DataFrame,
    keys_a: Sequence[str] = ("contig", "start", "stop"),
    keys_b: Sequence[str] | None = None,
    bin_size: int = 16384,
    chunk_size: int | None = None,
) -> DataFrame:
    """Jaccard similarity of two interval sets — bedtools jaccard:
    |A ∩ B| / |A ∪ B| in covered bases after flattening each side.
    Returns ONE row: (intersection_bases, union_bases, jaccard,
    n_intersections).

    Scale shape (r15): exactly ONE pass over the data — the operator is
    :func:`interval_multiinter` on the two sets (itself one composite-key
    two-phase merge + one fused boundary sweep) followed by a single
    scalar aggregate over the constant-coverage segments: segments
    covered by both sets sum to the intersection, every covered segment
    sums to the union, and each maximal both-covered segment corresponds
     1:1 to one merged-A x merged-B overlapping pair (within a flattened
    side coverage is 0/1 and merged intervals are >= 1 apart, so a
    both-covered run can cross neither side's gap), so counting them IS
    bedtools' n_intersections. This replaced a merged-A x merged-B
    binned self-join whose branches recomputed the merge three times
    (90 Exchanges at r14). ``bin_size`` is retained for signature
    compatibility; the segment form has no tile join to size.
    """
    del bin_size  # no tile join in the segment formulation
    kb = keys_b or keys_a
    mi = interval_multiinter(
        {
            "a": a.select(
                F.col(keys_a[0]).alias("_c"),
                F.col(keys_a[1]).cast("long").alias("_s"),
                F.col(keys_a[2]).cast("long").alias("_e"),
            ),
            "b": b.select(
                F.col(kb[0]).alias("_c"),
                F.col(kb[1]).cast("long").alias("_s"),
                F.col(kb[2]).cast("long").alias("_e"),
            ),
        },
        keys=("_c", "_s", "_e"),
        chunk_size=chunk_size,
    )
    seg_len = F.col("_e") - F.col("_s") + 1
    both = F.col("n_sets") == 2
    zero = F.lit(0).cast("long")
    union_bases = F.coalesce(F.sum(seg_len), zero)
    inter_bases = F.coalesce(F.sum(F.when(both, seg_len)), zero)
    return mi.agg(
        inter_bases.alias("intersection_bases"),
        union_bases.alias("union_bases"),
        (inter_bases / union_bases).alias("jaccard"),
        F.coalesce(F.sum(F.when(both, F.lit(1)).otherwise(F.lit(0))), zero).alias(
            "n_intersections"
        ),
    )


def interval_liftover(
    df: DataFrame,
    chain: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    chain_keys: Sequence[str] = (
        "src_contig", "src_start", "src_stop", "dst_contig", "dst_start"
    ),
    bin_size: int = 16384,
    min_match: float = 0.0,
    strand_col: str | None = None,
    broadcast_chain: bool = True,
) -> DataFrame:
    """Remap intervals to a new coordinate system through chain blocks —
    the UCSC liftOver operation. Each input interval is clipped to every
    chain block it overlaps and shifted by that block's source→dest
    offset; an interval spanning several blocks splits into several
    output rows, and an interval touching none is dropped (unmapped).

    ``min_match`` is liftOver's -minMatch: inputs whose bases are covered
    by chain blocks below this fraction are dropped entirely, and a
    ``mapped_fraction`` column is emitted. Chain blocks must be disjoint
    per source contig (true of real liftover chains); input rows must be
    unique tuples.

    ``strand_col`` names an optional chain column holding '+'/'-' (the
    UCSC qStrand, formats/chain.py): positions inside a '-' block MIRROR
    around the block (``dst_start`` is always the plus-strand low
    coordinate), and the column is carried into the output as
    ``dst_strand``. A chain frame that CARRIES a ``dst_strand`` column
    (everything ``formats.chain.read_chain`` returns — real liftOver
    chains routinely contain '-' blocks) is rejected when ``strand_col``
    is left unset: silently lifting minus blocks with plus-strand
    arithmetic would produce wrong coordinates with no error. Pass
    ``strand_col="dst_strand"`` (correct for any strand mix), or drop
    the column to assert a plus-only chain.

    Scale shape: ONE binned 16 kb-tile overlap join (the chain is usually
    broadcastable, but the tile join also handles chain-larger-than-memory)
    + pure column arithmetic; ``min_match > 0`` adds one window over the
    input-row key to total the mapped bases (bounded by the row's block
    pileup — the same unit as every interval op here).

    ``broadcast_chain`` (default True) pins the broadcast side of the tile
    join to the CHAIN. Left to its own size estimates Catalyst can pick
    the other side: the r17 before-plan broadcast the 1.1M-row exploded
    READS (BuildLeft, its post-distinct estimate looked small) and
    streamed the 25-block chain — the join plus the downstream partial
    aggregate then ran at the chain side's parallelism. Real liftover
    chains are a few MB (tens of thousands of blocks); pass False for a
    chain that genuinely cannot fit in memory and the same plan degrades
    to the shuffled tile join.
    """
    from pyspark.sql import Window

    c, s, e = keys
    sc, ss, se, dc, ds = chain_keys
    if strand_col is None and "dst_strand" in chain.columns:
        raise ValueError(
            "interval_liftover: the chain carries a dst_strand column but "
            "strand_col was not set — minus-strand blocks would be lifted "
            "with plus-strand arithmetic, silently mis-mapping. Pass "
            "strand_col='dst_strand', or drop the column to assert a "
            "plus-only chain."
        )
    ch_cols = [
        F.col(sc).alias("_sc"),
        F.col(ss).cast("long").alias("_ss"),
        F.col(se).cast("long").alias("_se"),
        F.col(dc).alias("_dc"),
        F.col(ds).cast("long").alias("_ds"),
    ]
    if strand_col is not None:
        ch_cols.append(F.col(strand_col).alias("_strand"))
    ch = chain.select(*ch_cols)
    if broadcast_chain:
        ch = F.broadcast(ch)
    hits = interval_join_binned(
        df, ch, left_keys=keys, right_keys=("_sc", "_ss", "_se"),
        bin_size=bin_size,
    )
    seg_extra = ["_se", "_strand"] if strand_col is not None else []
    seg = hits.select(
        *df.columns, "_dc", "_ds", "_ss", *seg_extra,
        F.greatest(F.col("_ss"), F.col(s).cast("long")).alias("_cs"),
        F.least(F.col("_se"), F.col(e).cast("long")).alias("_ce"),
    )
    if strand_col is None:
        lift_s = F.col("_ds") + F.col("_cs") - F.col("_ss")
        lift_e = F.col("_ds") + F.col("_ce") - F.col("_ss")
    else:
        p_hi = F.col("_ds") + (F.col("_se") - F.col("_ss"))
        lift_s = F.when(
            F.col("_strand") == "+", F.col("_ds") + F.col("_cs") - F.col("_ss")
        ).otherwise(p_hi - (F.col("_ce") - F.col("_ss")))
        lift_e = F.when(
            F.col("_strand") == "+", F.col("_ds") + F.col("_ce") - F.col("_ss")
        ).otherwise(p_hi - (F.col("_cs") - F.col("_ss")))
    carry = [col for col in df.columns if col not in (c, s, e)]
    out = [
        *carry,
        F.col("_dc").alias(c),
        lift_s.alias(s),
        lift_e.alias(e),
    ]
    if strand_col is not None:
        out.append(F.col("_strand").alias("dst_strand"))
    if min_match > 0:
        # Window key = one hashed row id, not the wide input tuple (the
        # same narrow-shuffle treatment as interval_join_binned's strict
        # left_outer; duplicate input rows share the id AND identical
        # segment sets, so the fraction is unchanged). 128-bit identity
        # (r16): a collision between distinct rows would silently merge
        # two mapped fractions — see _row_id128.
        seg = seg.withColumn(
            "_lid", _row_id128([F.col(col) for col in df.columns])
        )
        w = Window.partitionBy("_lid")
        frac = F.sum(F.col("_ce") - F.col("_cs") + 1).over(w) / (
            F.col(e).cast("long") - F.col(s).cast("long") + 1
        )
        seg = (
            seg.withColumn("_frac", frac)
            .filter(F.col("_frac") >= min_match)
            .drop("_lid")
        )
        out.append(F.col("_frac").alias("mapped_fraction"))
    return seg.select(*out)


def interval_multiinter(
    sets: "dict[str, DataFrame]",
    keys: Sequence[str] = ("contig", "start", "stop"),
    chunk_size: int | None = None,
) -> DataFrame:
    """Partition the genome by WHICH input sets cover it — bedtools
    multiinter. Given named interval sets, returns one row per maximal
    segment with a constant covering combination:
    ``(contig, start, stop, n_sets, set_list)`` where ``set_list`` is the
    sorted comma-joined names of the sets covering that segment
    (segments covered by none are not emitted).

    Scale shape: the classic event-point sweep with NO per-contig window
    anywhere — every merged interval becomes a +1 event at ``start`` and
    a -1 at ``stop + 1`` PER SET (a map-side explode); events
    pre-aggregate to one row per boundary position (per-set delta
    columns), and the per-set coverage state plus the next-boundary
    lookahead come from ONE fused chunked scan (operators/sweep.py
    chunked_scan — all running sums and the lookahead share a single
    exchange): local running sums per (contig, 8 Mb chunk) combined
    with chunk-granularity prefix offsets, so the sweep parallelism
    scales with data volume instead of capping at #contigs. Input sets
    are first flattened with :func:`interval_merge` (itself two-phase,
    one composite-key pass for all sets) so within-set overlaps cannot
    double-count. Never all-pairs; output size is bounded by 2x the
    total merged-interval count.
    """
    from functools import reduce

    from hadoop_bam_spark.operators.sweep import chunked_scan

    cs_kw = {"chunk_size": chunk_size}
    if not sets:
        raise ValueError("interval_multiinter needs at least one set")
    c, s, e = keys
    names = sorted(sets)
    # ONE two-phase merge over all sets at once: the merge key is the
    # composite struct (set, contig), so per-set flattening costs one
    # pass of stages instead of one per set (same result — merge never
    # mixes distinct key values).
    tagged = reduce(
        lambda a, b: a.unionByName(b),
        [
            sets[name].select(
                F.struct(
                    F.lit(name).alias("s"), F.col(c).alias("c")
                ).alias("_sc"),
                F.col(s).alias(s),
                F.col(e).alias(e),
            )
            for name in names
        ],
    )
    m = interval_merge(tagged, keys=("_sc", s, e), chunk_size=cs_kw["chunk_size"])
    # map-side explode, not a union of two selects: a union re-plans the
    # whole merge subtree twice statically (and the fused scan's summary
    # branch would double that again)
    ev = m.select(
        F.col("_sc.c").alias("_c"),
        F.col("_sc.s").alias("_set"),
        F.explode(
            F.array(
                F.struct(
                    F.col(s).cast("long").alias("pos"), F.lit(1).alias("delta")
                ),
                F.struct(
                    (F.col(e).cast("long") + 1).alias("pos"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("_ev"),
    ).select(
        "_c",
        F.col("_ev.pos").alias("_pos"),
        "_set",
        F.col("_ev.delta").alias("_delta"),
    )
    # ONE fused scan: every per-set running counter AND the next-boundary
    # lookahead share a single exchange+sort+summary round (r15 — the
    # separate lead pass cost a second full scan of the boundary table),
    # and the one-row-per-boundary-position aggregate (the scan's
    # uniqueness precondition) is FUSED into the scan's own exchange via
    # ``pre_agg`` (r18, guide §2.4): the standalone groupBy(_c, _pos)
    # shuffled the event table a second time right before the scan's
    # (key, chunk) repartition.
    state = chunked_scan(
        ev,
        ["_c"],
        "_pos",
        [(f"_d_{i}", "sum", f"_n_{i}") for i in range(len(names))]
        + [(F.col("_pos"), "min", "_next", "desc", True)],
        pre_agg=[
            F.sum(
                F.when(F.col("_set") == n, F.col("_delta")).otherwise(0)
            ).alias(f"_d_{i}")
            for i, n in enumerate(names)
        ],
        **cs_kw,
    )
    covered = [F.col(f"_n_{i}") > 0 for i in range(len(names))]
    n_sets = reduce(lambda a, b: a + b, [F.when(cv, 1).otherwise(0) for cv in covered])
    set_list = F.concat_ws(
        ",",
        F.filter(
            F.array(*[
                F.when(cv, F.lit(n)).otherwise(F.lit(None)) for cv, n in zip(covered, names)
            ]),
            lambda x: x.isNotNull(),
        ),
    )
    return (
        state
        .filter(F.col("_next").isNotNull() & (n_sets > 0))
        .select(
            F.col("_c").alias(c),
            F.col("_pos").alias(s),
            (F.col("_next") - 1).alias(e),
            n_sets.alias("n_sets"),
            set_list.alias("set_list"),
        )
    )


def interval_cluster(
    df: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    gap: int = 0,
    chunk_size: int | None = None,
) -> DataFrame:
    """Assign a cluster id to every interval — bedtools cluster: two
    intervals share an id iff they are connected through a chain of
    overlapping (or ``gap``-close, book-ended at ``gap=0``) intervals,
    i.e. they fall inside the same :func:`interval_merge` region. Returns
    the input rows plus ``cluster_id`` (a per-contig ordinal in region
    start order, starting at 1; the pair (contig, cluster_id) is
    globally unique).

    Scale shape: the same two-phase range-partitioned sweep as
    :func:`interval_merge` (see :func:`_chunked_local_merge`) with the
    rows carried through instead of collapsed: local cluster ids per
    (contig, chunk) window, a chunk-granularity stitch map to final
    region origins, then ids join back to the rows on (contig, chunk,
    local id). The ordinal assignment itself runs over ONE ROW PER
    FINAL CLUSTER, and (r15) even that is the chunked prefix scan — a
    running count of origins per (contig, 8 Mb chunk) with
    chunk-granularity offsets equals the per-contig row_number because
    origins are unique per contig — so a degenerate corpus where
    nothing merges (regions ≈ data-sized) hits no per-contig window
    either. Tie rows (identical start/stop) land in the same cluster
    under any tie order, so the plan is deterministic without a unique
    row key.
    """
    from hadoop_bam_spark.operators.sweep import (
        chunked_scan,
        resolve_chunk_size,
    )

    c, s, e = keys
    # one resolution for both passes (the ordinal scan then inherits the
    # same forced/adaptive decision as the merge sweep)
    chunk_size = resolve_chunk_size(df, chunk_size, MERGE_CHUNK_SIZE, [c])
    runs, base = _chunked_local_merge(df, keys, gap, chunk_size, carry_rows=True)
    regions = chunked_scan(
        runs.select(c, "_origin").distinct(),
        [c],
        "_origin",
        [(F.lit(1), "sum", "cluster_id")],
        chunk_size=chunk_size,
    ).withColumn("cluster_id", F.col("cluster_id").cast("long"))
    run_map = (
        runs.select(c, "_chunk", "_grp", "_origin")
        .join(regions, on=[c, "_origin"])
        .select(c, "_chunk", "_grp", "cluster_id")
    )
    return base.join(run_map, on=[c, "_chunk", "_grp"]).select(
        *df.columns, "cluster_id"
    )


def genome_sizes(spark, path: str) -> DataFrame:
    """Load a contig-sizes table — the ``sizes`` input of
    :func:`interval_complement` — from either a UCSC ``.chrom.sizes`` /
    bedtools ``.genome`` file (``contig<TAB>size`` lines) or a faidx
    ``.fai`` sidecar (first two of its five columns). Driver-side parse
    (dimension-sized, broadcastable), like ``formats.chain.read_chain``.
    """
    rows = []
    with open(path, "rt", encoding="utf-8") as fh:
        for ln, raw in enumerate(fh, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            f = line.split("\t")
            if len(f) < 2:
                raise ValueError(
                    f"{path}:{ln}: expected 'contig<TAB>size', got {line!r}"
                )
            try:
                size = int(f[1])
            except ValueError:
                raise ValueError(f"{path}:{ln}: non-integer size {f[1]!r}")
            if size < 0:
                raise ValueError(f"{path}:{ln}: negative size {size}")
            rows.append((f[0], size))
    seen = set()
    for contig, _ in rows:
        if contig in seen:
            raise ValueError(
                f"{path}: duplicate contig {contig!r} (faidx rejects "
                "duplicates too; a doubled line would duplicate "
                "complement tail gaps)"
            )
        seen.add(contig)
    from hadoop_bam_spark.session import local_df

    return local_df(spark, rows, "contig string, size long")


def interval_slop(
    df: DataFrame,
    sizes: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    left: int = 0,
    right: int = 0,
    strand_col: str | None = None,
) -> DataFrame:
    """Grow each interval by ``left`` bases upstream and ``right`` bases
    downstream — bedtools slop — clamped to [1, contig size]. With
    ``strand_col`` (bedtools -s), upstream/downstream follow the
    feature's strand: a '-' row grows ``left`` at its high end. Rows on
    contigs absent from ``sizes`` are dropped (same universe rule as
    interval_complement).

    Scale shape: map-only arithmetic + one broadcast join against the
    (dimension-sized) sizes table. All non-key columns ride along.
    """
    c, s, e = keys
    sz = sizes.select(F.col(sizes.columns[0]).alias(c),
                      F.col(sizes.columns[1]).cast("long").alias("_size"))
    out = df.join(F.broadcast(sz), on=c)
    if strand_col is None:
        lo, hi = F.lit(left), F.lit(right)
    else:
        minus = F.col(strand_col) == "-"
        lo = F.when(minus, right).otherwise(left)
        hi = F.when(minus, left).otherwise(right)
    ns = F.greatest(F.col(s).cast("long") - lo, F.lit(1))
    ne = F.least(F.col(e).cast("long") + hi, F.col("_size"))
    carry = [col for col in df.columns if col not in (s, e)]
    return out.select(*carry, ns.alias(s), ne.alias(e))


def interval_flank(
    df: DataFrame,
    sizes: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    left: int = 0,
    right: int = 0,
    strand_col: str | None = None,
) -> DataFrame:
    """The flanking regions NEXT TO each interval (not including it) —
    bedtools flank: up to one ``left``-length interval upstream and one
    ``right``-length downstream, clamped to [1, contig size]; empty
    flanks (length 0 or fully off-contig) are not emitted. Strand-aware
    like :func:`interval_slop`. Adds a ``flank_side``
    ('upstream'/'downstream') column.

    Scale shape: map-only — one broadcast sizes join, a 2-element array
    explode per row, no shuffle.
    """
    c, s, e = keys
    sz = sizes.select(F.col(sizes.columns[0]).alias(c),
                      F.col(sizes.columns[1]).cast("long").alias("_size"))
    out = df.join(F.broadcast(sz), on=c)
    if strand_col is None:
        lo, hi = F.lit(left), F.lit(right)
    else:
        minus = F.col(strand_col) == "-"
        lo = F.when(minus, right).otherwise(left)
        hi = F.when(minus, left).otherwise(right)
    s_l = F.col(s).cast("long")
    e_l = F.col(e).cast("long")
    up = F.struct(
        F.lit("upstream").alias("side"),
        F.greatest(s_l - lo, F.lit(1)).alias("fs"),
        (s_l - 1).alias("fe"),
    )
    down = F.struct(
        F.lit("downstream").alias("side"),
        (e_l + 1).alias("fs"),
        F.least(e_l + hi, F.col("_size")).alias("fe"),
    )
    flanks = F.filter(
        F.array(up, down),
        lambda x: (x["fs"] <= x["fe"]) & (x["fe"] >= 1)
        & (x["fs"] <= F.col("_size")),
    )
    carry = [col for col in df.columns if col not in (s, e)]
    return out.select(*carry, F.explode(flanks).alias("_f")).select(
        *carry,
        F.col("_f.fs").alias(s),
        F.col("_f.fe").alias(e),
        F.col("_f.side").alias("flank_side"),
    )


def genome_makewindows(
    sizes: DataFrame,
    window_size: int,
    step: int | None = None,
) -> DataFrame:
    """Tile the genome into fixed-size windows — bedtools makewindows
    (-w window_size [-s step]): per contig of the ``sizes`` table, emit
    ``(contig, start, stop, window_id)`` rows covering [1, size] with
    ``step`` stride (default = window_size, i.e. non-overlapping tiles;
    the last window clips at the contig end). The canonical binning
    primitive for per-window coverage/aggregation pipelines.

    Scale shape: generator, not a scan — the sizes table is
    dimension-sized, each contig row EXPLODES to its window count, and a
    round-robin repartition spreads the generated rows so downstream
    stages aren't capped at #contigs tasks.
    """
    if window_size <= 0:
        raise ValueError("window_size must be positive")
    st = step or window_size
    if st <= 0:
        raise ValueError("step must be positive")
    c = sizes.columns[0]
    sz = sizes.select(
        F.col(c).alias("contig"),
        F.col(sizes.columns[1]).cast("long").alias("_size"),
    ).filter(F.col("_size") > 0)
    n_win = F.floor((F.col("_size") - 1) / st) + 1
    out = sz.select(
        "contig",
        "_size",
        F.posexplode(F.sequence(F.lit(0).cast("long"), n_win - 1)),
    ).select(
        "contig",
        (F.col("col") * st + 1).alias("start"),
        F.least(F.col("col") * st + window_size, F.col("_size")).alias("stop"),
        F.col("col").alias("window_id"),
    )
    spark = sizes.sparkSession
    return out.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )


def interval_window(
    left: DataFrame,
    right: DataFrame,
    before: int = 0,
    after: int = 0,
    keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] | None = None,
    bin_size: int = 16384,
    how: str = "inner",
) -> DataFrame:
    """Overlap join with a proximity margin — bedtools window (-l/-r):
    a right interval matches when it overlaps the left interval GROWN by
    ``before`` bases upstream and ``after`` downstream (no genome-bounds
    clamp, like bedtools window; compose with :func:`interval_slop` when
    clamping matters). Output carries the ORIGINAL left coordinates.

    Scale shape: exactly :func:`interval_join_binned` on the widened
    span — the tile explode uses the widened coordinates so no match can
    fall outside the joined bins, then the temporary columns drop.
    """
    c, s, e = keys
    widened = left.select(
        "*",
        (F.col(s).cast("long") - before).alias("_ws"),
        (F.col(e).cast("long") + after).alias("_we"),
    )
    out = interval_join_binned(
        widened, right, left_keys=(c, "_ws", "_we"),
        right_keys=right_keys or keys, bin_size=bin_size, how=how,
    )
    return out.drop("_ws", "_we")


def interval_reldist(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] | None = None,
    chunk_size: int | None = None,
) -> DataFrame:
    """Relative-distance distribution — bedtools reldist: for each left
    interval midpoint, find the two FLANKING right midpoints and report
    ``min(d_prev, d_next) / (next - prev)`` — uniformly distributed on
    [0, 0.5] when the sets are spatially independent, skewed toward 0
    when they co-locate (the colocalization QC statistic). Returns the
    histogram ``(reldist, count, fraction)`` with reldist rounded down
    to 1/100ths, like bedtools. A left midpoint exactly coinciding with
    a right midpoint yields reldist 0 (bedtools reports 0.00 — the
    colocalization extreme the statistic exists to detect): the
    preceding scan INCLUDES the coincident right (prev = the midpoint
    itself) while the following scan is STRICT (next = the true
    following flank), so the ratio is 0/(next - prev). Left midpoints
    without both flanks under that rule are dropped, per bedtools —
    including a coincident midpoint with no STRICTLY following right
    (nothing to normalize by).

    Scale shape: ONE fused chunked scan over the unioned midpoints
    (operators/sweep.py chunked_scan — the preceding prefix max and the
    strict following suffix min share a single RANGE-frame window pass:
    one exchange + one sort), then a tiny histogram aggregate. No
    per-contig data window, nothing all-pairs.
    """
    from hadoop_bam_spark.operators.sweep import chunked_scan

    cs = {"chunk_size": chunk_size}
    c, s, e = keys
    rk = right_keys or keys
    # bedtools uses integer midpoints: (start + stop) / 2 floor in
    # 0-based half-open; with 1-based closed ends the same point is
    # floor((start - 1 + stop) / 2) on the 0-based axis.
    l_mid = left.select(
        F.col(c).alias("_c"),
        F.floor((F.col(s).cast("long") - 1 + F.col(e).cast("long")) / 2).alias("_m"),
        F.lit(1).alias("_t"),
    )
    r_mid = right.select(
        F.col(rk[0]).alias("_c"),
        F.floor(
            (F.col(rk[1]).cast("long") - 1 + F.col(rk[2]).cast("long")) / 2
        ).alias("_m"),
        F.lit(0).alias("_t"),
    )
    u = l_mid.unionByName(r_mid)
    cand = F.when(F.col("_t") == 0, F.col("_m"))
    u = chunked_scan(
        u,
        ["_c"],
        "_m",
        [
            # inclusive: a coincident right IS the preceding flank
            (cand, "max", "_prev", "asc"),
            # strict: the following flank is the first right BEYOND the
            # midpoint, so coincidence yields 0/(next-prev) = 0
            (cand, "min", "_next", "desc", True),
        ],
        **cs,
    )
    # _next > _prev holds by construction (prev <= m < next).
    rel = (
        u.filter(
            (F.col("_t") == 1)
            & F.col("_prev").isNotNull()
            & F.col("_next").isNotNull()
        )
        .select(
            (
                F.least(
                    F.col("_m") - F.col("_prev"), F.col("_next") - F.col("_m")
                )
                / (F.col("_next") - F.col("_prev"))
            ).alias("_rd")
        )
        .select((F.floor(F.col("_rd") * 100) / 100).alias("reldist"))
    )
    counts = rel.groupBy("reldist").agg(F.count(F.lit(1)).alias("count"))
    total = counts.agg(F.sum("count").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "reldist",
            "count",
            (F.col("count") / F.col("_tot")).alias("fraction"),
        )
    )


def interval_getfasta(
    intervals: DataFrame,
    fasta: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    bin_size: int = 16384,
    out_col: str = "seq",
) -> DataFrame:
    """Extract the reference sequence of each interval — bedtools
    getfasta: join intervals against the FASTA scan's chunk rows
    (``spark.read.format("fasta")`` yields ``(contig, pos, seq)``
    chunks, sources/fasta_source.py), slice the overlapping part of
    every chunk, and stitch the pieces in coordinate order. Intervals
    with no overlapping sequence are dropped (off-contig coordinates,
    like bedtools' warning-and-skip); a partially-covered interval
    returns the covered prefix/suffix. Interval rows must be unique
    tuples (the regroup key) — duplicated rows RAISE at runtime (the
    stitch walk checks that chunk starts strictly increase within each
    group; a duplicate tuple doubles every chunk piece, which would
    otherwise collapse to fewer output rows with no error). Dedupe
    inputs, or carry a distinguishing id column.

    Scale shape: ONE binned tile join intervals x chunk rows + one
    regroup per interval — per-interval cost is bounded by
    interval_length / chunk_size pieces; the stitch is an array
    sort + join, no Python, no driver round-trip. FASTA chunks stream
    from the splittable faidx scan, so a whole-genome extraction never
    materializes a contig in one task.
    """
    c, s, e = keys
    f = fasta.select(
        F.col("contig").alias("_fc"),
        F.col("pos").cast("long").alias("_fs"),
        (F.col("pos").cast("long") + F.length("seq") - 1).alias("_fe"),
        F.col("seq").alias("_fseq"),
    )
    hits = interval_join_binned(
        intervals, f, left_keys=keys, right_keys=("_fc", "_fs", "_fe"),
        bin_size=bin_size,
    )
    lo = F.greatest(F.col(s).cast("long"), F.col("_fs"))
    hi = F.least(F.col(e).cast("long"), F.col("_fe"))
    piece = F.substring(
        F.col("_fseq"),
        (lo - F.col("_fs") + 1).cast("int"),
        (hi - lo + 1).cast("int"),
    )
    pieces = F.sort_array(
        F.collect_list(F.struct(F.col("_fs").alias("fs"), piece.alias("p")))
    )
    # Stitch + guardrail in one walk: chunk starts must strictly
    # increase within a group — a repeated fs means the interval tuple
    # was duplicated (every chunk piece doubled), which the regroup
    # would otherwise collapse silently.
    stitched = F.aggregate(
        pieces,
        F.struct(
            F.lit(None).cast("long").alias("prev"),
            F.lit("").cast("string").alias("acc"),
        ),
        lambda a, x: F.struct(
            x["fs"].alias("prev"),
            F.concat(
                a["acc"],
                F.when(
                    a["prev"].isNotNull() & (x["fs"] <= a["prev"]),
                    F.raise_error(
                        F.lit(
                            "interval_getfasta: duplicate interval tuples "
                            "(the stitch regroups on the whole interval "
                            "row, so duplicates would silently collapse) "
                            "— dedupe inputs or add a distinct id column"
                        )
                    ),
                ).otherwise(x["p"]),
            ).alias("acc"),
        ),
        lambda a: a["acc"],
    )
    return hits.groupBy(*intervals.columns).agg(stitched.alias(out_col))


def interval_shuffle(
    df: DataFrame,
    sizes: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    id_col: str | None = None,
    salt: str = "ivshuffle",
    keep_contig: bool = True,
) -> DataFrame:
    """Place each interval at a deterministic pseudo-random position —
    bedtools shuffle: lengths are preserved and the draw hashes a stable
    row id (``id_col``, default the ORIGINAL interval tuple) with
    ``salt``, so the shuffle is reproducible across runs/retries/engines
    — the null-model primitive for :func:`interval_reldist` /
    :func:`interval_jaccard` colocalization tests (compare the observed
    statistic against the shuffled one).

    ``keep_contig=True`` (bedtools -chrom): new starts are drawn
    uniformly from [1, size - len + 1] of the SAME contig; rows longer
    than their contig, or on contigs absent from ``sizes``, are dropped.

    ``keep_contig=False`` (r15 — bedtools' default mode): the draw is
    genome-wide and uniform over every VALID placement: per row, each
    contig contributes ``max(0, size - len + 1)`` slots, the 60-bit hash
    draws one slot in [0, total_slots), and a single fold over the
    (lexicographically ordered) contig list maps it to (contig, start).
    Weighting by per-contig room — rather than drawing a raw genome
    offset and clamping at contig ends — keeps the placement exactly
    uniform with no end-of-contig pile-up, stays deterministic, and
    replays in plain SQL (the gate oracle walks the same cumulative
    rooms). Rows longer than EVERY contig are dropped.

    Scale shape: map-only hash arithmetic; the same-contig form adds one
    broadcast join against the dimension-sized ``sizes`` table, the
    genome-wide form folds over a collected-to-literal contig array
    (bounded by #contigs — the .fai is a dimension table) so there is no
    join at all. All non-key columns ride along.
    """
    from hadoop_bam_spark.operators.dedup import hash60

    c, s, e = keys
    ident = (
        F.col(id_col).cast("string")
        if id_col is not None
        else F.concat_ws(
            ":", F.col(c), F.col(s).cast("string"), F.col(e).cast("string")
        )
    )
    draw = hash60(F.concat(F.lit(salt), F.lit(":"), ident))
    ln = F.col(e).cast("long") - F.col(s).cast("long") + 1
    carry = [col for col in df.columns if col not in (s, e)]
    if keep_contig:
        sz = sizes.select(
            F.col(sizes.columns[0]).alias(c),
            F.col(sizes.columns[1]).cast("long").alias("_size"),
        )
        room = F.col("_size") - ln + 1
        new_start = draw % room + 1
        return (
            df.join(F.broadcast(sz), on=c)
            .filter(room > 0)
            .select(
                *carry,
                new_start.alias(s),
                (new_start + ln - 1).alias(e),
            )
        )
    # Genome-wide: fold once over the literal contig list. sizes is
    # dimension-sized by nature (one row per contig), so collecting it
    # to the driver is the bounded-aggregate pattern, not a data
    # collect; lexicographic contig order pins the walk (and the
    # oracle's) deterministically.
    contig_t = sizes.schema[sizes.columns[0]].dataType
    rows = sorted(
        (r[0], r[1])
        for r in sizes.select(
            F.col(sizes.columns[0]),
            F.col(sizes.columns[1]).cast("long"),
        ).collect()
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(name).cast(contig_t).alias("c"),
                F.lit(size).alias("sz"),
            )
            for name, size in rows
        ]
    )
    zero = F.lit(0).cast("long")

    def room_of(x):
        return F.greatest(zero, x["sz"] - ln + 1)

    total_room = F.aggregate(arr, zero, lambda a, x: a + room_of(x))
    # try_mod: null when total_room = 0 (row fits nowhere) instead of an
    # ANSI remainder-by-zero error
    r = F.try_mod(draw, total_room)
    pick = F.aggregate(
        arr,
        F.struct(
            r.alias("rem"),
            F.lit(None).cast(contig_t).alias("c"),
            F.lit(None).cast("long").alias("s"),
        ),
        lambda a, x: F.when(a["c"].isNotNull(), a)
        .when(
            a["rem"] < room_of(x),
            F.struct(a["rem"].alias("rem"), x["c"].alias("c"), (a["rem"] + 1).alias("s")),
        )
        .otherwise(
            F.struct(
                (a["rem"] - room_of(x)).alias("rem"),
                F.lit(None).cast(contig_t).alias("c"),
                F.lit(None).cast("long").alias("s"),
            )
        ),
    )
    carry_nc = [col for col in carry if col != c]
    return (
        df.withColumn("_pick", pick)
        .filter(F.col("_pick.c").isNotNull())
        .select(
            *carry_nc,
            F.col("_pick.c").alias(c),
            F.col("_pick.s").alias(s),
            (F.col("_pick.s") + ln - 1).alias(e),
        )
    )


def interval_random(
    sizes: DataFrame,
    n: int,
    length: int,
    salt: str = "ivrandom",
    keys: Sequence[str] = ("contig", "start", "stop"),
) -> DataFrame:
    """Generate ``n`` deterministic pseudo-random intervals of ``length``
    bases, uniform over every valid genome placement — bedtools random
    (-n/-l, with the salt playing -seed). Returns
    ``(interval_id, contig, start, stop)``; intervals longer than every
    contig yield an empty result (bedtools errors; staying total keeps
    the generator composable).

    Scale shape: a ``spark.range`` generator piped through
    :func:`interval_shuffle`'s genome-wide placement (``keep_contig=
    False``) — map-only hash arithmetic folding over the literal contig
    list, no join, no shuffle; parallelism is range-partitioned, so
    generating billions of null-model intervals distributes trivially.
    The null-model companion of :func:`interval_shuffle` for
    reldist/jaccard colocalization tests when no observed set is being
    permuted.
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    if length <= 0:
        raise ValueError("length must be positive")
    c, s, e = keys
    spark = sizes.sparkSession
    base = spark.range(n).select(
        F.col("id").alias("interval_id"),
        F.lit(1).cast("long").alias(s),
        F.lit(length).cast("long").alias(e),
    )
    return interval_shuffle(
        base,
        sizes,
        keys=keys,
        id_col="interval_id",
        salt=salt,
        keep_contig=False,
    ).select("interval_id", c, s, e)
