"""Distributed prefix scans over genome coordinates — the chunked
running-aggregate machinery behind the event-sweep operators.

Several operators are per-contig sequential sweeps at heart: a running
sum of coverage deltas (pileup), running per-set counters (multiinter),
a running max/min of neighbor coordinates (closest). Expressed as one
``Window.partitionBy(contig)`` each caps its sweep at #contigs-way
parallelism — the same ceiling the two-phase ``interval_merge``
(operators/interval_join.py ``_chunked_local_merge``) removed for the
merge family. This module is the generic form of that fix for ANY
associative running aggregate:

- phase 1: rows land in the range chunk of their position
  (``floor((pos-1)/chunk_size)``); a window per (partition keys, chunk)
  computes the LOCAL running aggregate — parallelism scales with data;
- phase 2: per-chunk totals (ONE row per non-empty chunk) get an
  exclusive prefix aggregate per partition key over the tiny summary
  table, broadcast back, and combined into the exact global running
  value (sum/max/min are associative, so local ⊕ prefix-of-chunk-totals
  ≡ the single-window result).

FUSION (r15): every scan a consumer needs — ascending prefixes,
descending suffixes, strict (exclude-current-position) variants, and
the next-position lookahead — runs in ONE :func:`chunked_scan` call:
ONE exchange for the whole batch, an ascending RANGE-frame Window for
the asc specs and (only when desc specs exist) a second Window over the
descending sort of the same partitioning (a Sort, not an Exchange);
the chunk summary is ONE groupBy whose prefix offsets share the same
two-direction shape over the tiny summary table. The previous
one-call-per-scan form cost a full exchange+sort+summary round per
helper call — pileup's plan carried 114 Exchanges, jaccard 90. Every
frame is an unbounded-PRECEDING (growing) frame, which Spark maintains
incrementally; suffix scans reverse the sort rather than use
unbounded-FOLLOWING frames, which Spark recomputes from scratch per
row (quadratic per partition).

Tie semantics: RANGE frames, i.e. the running value at a row is the
state of the scan AT ITS POSITION — rows sharing a position share the
value (inclusive frames see all of them, strict frames none). Every
consumer either pre-aggregates to unique positions or marks candidate
rows with a ``when()`` so non-candidates contribute NULL, which the
aggregates ignore; positions must be numeric and non-null. Rows with
equal positions always share a chunk (the chunk is a function of the
position), so cross-chunk combination never sees ties and strictness is
purely a local-frame matter.

The reference has no streaming/sweep machinery at all (Hadoop-BAM stops
at record I/O, BAMInputFormat.java); this generalizes the textbook
parallel-prefix construction to Spark windows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default chunk width — same rationale as interval_join.MERGE_CHUNK_SIZE
SWEEP_CHUNK_SIZE = 8 << 20

#: ``chunk_size`` sentinel forcing the plain one-window-per-partition-key
#: form (no chunk decomposition, no summary round).
SINGLE_WINDOW = 0

#: adaptive stage 1 (Catalyst plan-stats estimate, free): only inputs at or
#: below this are even CONSIDERED for the single-window form; anything
#: larger — or with no usable estimate (unknown-size sources report
#: Long.MAX) — takes the chunked form unconditionally and without running
#: any job, so the 100 TB path never pays a probe. 256 MB ≈ 8M interval
#: rows, where measured chunking overhead has amortized to ~1.4x and keeps
#: falling (STRESS_INTERVAL_r15).
ADAPTIVE_SINGLE_MAX_BYTES = 256 << 20

#: adaptive stage 2 (one cheap probe job over the — small, stage-1-bounded
#: — input): the single-window form is chosen only when the HOTTEST
#: partition key holds at most this many rows, because the per-key window
#: runs that key in ONE task — bytes alone cannot see skew (a 2M-row
#: corpus on 24 contigs wants the plain window, the same 2M on ONE contig
#: wants the decomposition; STRESS_INTERVAL_r15 measured 2-3.3x either
#: way). 256k rows is well under a second of single-task sweep.
ADAPTIVE_SINGLE_MAX_KEY_ROWS = 1 << 18

#: adaptive stage 0 (r18, VERDICT r17 next #7 — the probe used to execute
#: the full upstream a second time at DataFrame-construction time even
#: when the input was trivially small): when the Catalyst size estimate
#: bounds the TOTAL row count below ADAPTIVE_SINGLE_MAX_KEY_ROWS, even a
#: 100%-skewed input cannot exceed the per-key bound, so the
#: single-window form is chosen WITHOUT running the skew probe at all.
#: Plan-stats row-width estimates are >= 8 bytes/row for any row carrying
#: a key and a position (each estimated column contributes its type
#: width), so rows <= size / 8. Decisions are unchanged (a probe on such
#: an input always answered "single"); the extra upstream execution is
#: gone. At the default bound this shortcut covers inputs up to
#: 256k * 8 = 2 MB — e.g. every per-contig region merge at bench SFs.
_MIN_EST_ROW_BYTES = 8

_OPS = {"sum", "max", "min"}
_DIRS = {"asc", "desc"}


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for a plan — free (no job runs). Returns
    None when the JVM call fails; absurdly-large defaults (unknown-size
    sources) simply fail the small test, which is the safe direction."""
    try:
        return int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return None


#: memo of adaptive decisions keyed by (semantic plan hash, part_cols):
#: re-planning the same input (bench reps, a pipeline reusing one frame
#: across several sweep ops) must not re-run the probe job. Decisions are
#: perf-only (both forms are exact), so a semantic-hash collision cannot
#: produce a wrong ANSWER — and the memo ASSUMES the underlying files are
#: immutable for the session (the testdata contract): if data changes
#: under an identical plan mid-session, a stale entry can only pick the
#: slower-but-exact form, never a wrong result. Bounded; cleared
#: wholesale when full.
_DECISION_CACHE: dict = {}
_DECISION_CACHE_MAX = 1024


def resolve_chunk_size(
    df: DataFrame,
    chunk_size: int | None,
    default: int,
    part_cols: Sequence[str] | None = None,
) -> int:
    """Adaptive chunk-size policy shared by every sweep consumer.

    ``None`` = adaptive: inputs small by Catalyst plan stats
    (:data:`ADAPTIVE_SINGLE_MAX_BYTES`, free) AND balanced by a max
    rows-per-key probe (:data:`ADAPTIVE_SINGLE_MAX_KEY_ROWS`, one cheap
    aggregate job over a part_cols projection of the already-small
    input — the only eager action in the module, batch frames only,
    memoized per semantic plan) take the single-window form; everything
    else takes ``default``. An explicit int forces that chunk width;
    :data:`SINGLE_WINDOW` forces the plain per-key window. Without
    ``part_cols`` the skew probe cannot run, so the decision is
    conservatively ``default``.
    """
    if chunk_size is not None:
        return chunk_size
    if part_cols is None:
        return default
    try:
        key = (df.semanticHash(), tuple(part_cols), default)
    except Exception:
        key = None
    if key is not None and key in _DECISION_CACHE:
        return _DECISION_CACHE[key]
    decision = default
    size = _plan_size_bytes(df)
    if (
        size is not None
        and size <= ADAPTIVE_SINGLE_MAX_KEY_ROWS * _MIN_EST_ROW_BYTES
        and size <= ADAPTIVE_SINGLE_MAX_BYTES
    ):
        # so small that even total skew stays under the probe's row bound
        # — decide without executing the upstream at all (r18).
        decision = SINGLE_WINDOW
    elif size is not None and size <= ADAPTIVE_SINGLE_MAX_BYTES:
        try:
            mx = (
                df.select(*part_cols)
                .groupBy(*part_cols)
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
            if mx is None or mx <= ADAPTIVE_SINGLE_MAX_KEY_ROWS:
                decision = SINGLE_WINDOW
        except Exception:
            pass
    if key is not None:
        if len(_DECISION_CACHE) >= _DECISION_CACHE_MAX:
            _DECISION_CACHE.clear()
        _DECISION_CACHE[key] = decision
    return decision


def _combine(op: str, loc, off):
    if op == "sum":
        return (
            F.when(loc.isNull(), off)
            .when(off.isNull(), loc)
            .otherwise(loc + off)
        )
    # greatest/least skip nulls (null only when BOTH are)
    return (F.greatest if op == "max" else F.least)(loc, off)


def _norm_specs(specs: Sequence[tuple]) -> list[tuple]:
    out = []
    for spec in specs:
        val, op, name, *rest = spec
        direction = rest[0] if len(rest) >= 1 else "asc"
        strict = rest[1] if len(rest) >= 2 else False
        if op not in _OPS:
            raise ValueError(f"unsupported running op {op!r}")
        if direction not in _DIRS:
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        out.append((val, op, name, direction, bool(strict)))
    return out


def chunked_scan(
    df: DataFrame,
    part_cols: Sequence[str],
    pos_col: str,
    specs: Sequence[tuple],
    chunk_size: int | None = None,
    broadcast_summary: bool | None = None,
    pre_agg: Sequence | None = None,
) -> DataFrame:
    """Add exact running aggregates over (``part_cols`` partitions ordered
    by ``pos_col``) without a per-partition-key window — ALL specs fused
    into one data pass (one exchange + one sort + one chunk-summary
    round, however many scans are requested).

    ``specs``: ``(value_column_or_expr, op, output_name[, direction[,
    strict]])`` tuples with op in sum/max/min; ``direction`` ``"asc"``
    (prefix scan over positions <= this row's, the default) or
    ``"desc"`` (suffix scan over positions >= it); ``strict=True``
    excludes rows AT this row's position. RANGE-frame semantics: rows
    sharing a position share the running value (see module docstring).
    Null values are transparent (ignored by the aggregate).

    The next DISTINCT position (the ``lead`` lookahead every boundary
    sweep needs) is just ``(F.col(pos_col), "min", out, "desc", True)``
    — it fuses with the rest for free.

    ``chunk_size=None`` (the default, r16) is ADAPTIVE: small inputs by
    Catalyst plan stats (:func:`resolve_chunk_size`) take the plain
    one-window-per-partition-key form — no summary round, no join, the
    same frames over ``Window.partitionBy(part_cols)`` — because the
    chunk decomposition cannot pay for its overhead when the whole input
    fits a handful of tasks; everything else (including unknown-size
    inputs) takes the chunked form, whose parallelism scales with data
    volume. Pass an explicit int to force a chunk width (correctness
    tests force tiny chunks) or :data:`SINGLE_WINDOW` to force the plain
    window.

    ``broadcast_summary``: ``None`` (default, r16) does NOT force a
    broadcast — the summary join's keys are exactly the data pass's
    window partitioning (part_cols, chunk), so the static sort-merge
    join REUSES that exchange and sort, and AQE upgrades it to a
    broadcast at runtime when the summary turns out small (per-contig
    genome sweeps: always). The r15 form forced the hint, which with a
    HIGH-cardinality ``part_cols`` (an as-of join keyed by millions of
    ids: #keys x #chunks summary rows) was a silent executor-OOM risk —
    the docstring told callers to opt out, nothing enforced it. ``True``
    still forces the hint (callers that KNOW the summary is
    dimension-bounded); ``False`` is the explicit no-hint spelling.

    ``pre_agg`` (r18, guide §2.4 — share one exchange): optional list of
    aggregate Columns. The boundary-event consumers (pileup,
    multiinter) reduce their event table to ONE row per (part_cols,
    position) before scanning; done as a plain ``groupBy`` upstream that
    costs a SECOND full exchange of the event table (hash on (part,
    pos)) immediately before this function's own exchange (hash on
    (part, chunk)). Passing the aggregates here fuses them: the group
    keys extend with the chunk column — the chunk is a pure function of
    the position, so groups are identical — and the aggregate runs
    AFTER (and co-partitioned with) the one exchange the window needs
    anyway. The scan's output frame then carries ONLY part_cols,
    pos_col and the aggregate outputs (plus the spec outputs); spec
    value expressions must reference the aggregated columns.
    """
    sp = _norm_specs(specs)
    part = list(part_cols)
    chunk_size = resolve_chunk_size(df, chunk_size, SWEEP_CHUNK_SIZE, part)
    if chunk_size == SINGLE_WINDOW:
        if pre_agg is not None:
            # one exchange here too: repartition by the window's keys,
            # then group on (part, pos) — a superset, so the aggregate
            # reuses the distribution instead of adding its own hash
            # (part, pos) exchange, and the window below adds none.
            if part:
                df = df.repartition(*[F.col(p) for p in part])
            df = df.groupBy(*part, pos_col).agg(*pre_agg)
        wasc = Window.partitionBy(*part).orderBy(F.col(pos_col).asc())
        wdesc = Window.partitionBy(*part).orderBy(F.col(pos_col).desc())
        frames = {
            ("asc", False): wasc.rangeBetween(Window.unboundedPreceding, 0),
            ("asc", True): wasc.rangeBetween(Window.unboundedPreceding, -1),
            ("desc", False): wdesc.rangeBetween(Window.unboundedPreceding, 0),
            ("desc", True): wdesc.rangeBetween(Window.unboundedPreceding, -1),
        }
        return df.select(
            "*",
            *[
                getattr(F, op)(val).over(frames[(d, st)]).alias(out)
                for val, op, out, d, st in sp
            ],
        )
    chunk = F.floor((F.col(pos_col) - 1) / F.lit(chunk_size)).cast("long")
    # ``_swkey`` packs the partition columns into ONE struct (r17): struct
    # equality is null-safe per field, so the chunk-summary join below can
    # no longer silently drop the offsets of NULL-keyed rows (a stranded
    # interval_closest groups NULL strands — the r16 ADVICE high: NULL
    # part-col rows lost every cross-chunk candidate on the chunked path
    # while the single-window path answered correctly). Window partitioning,
    # the summary groupBy, and the join all key on the same struct, so they
    # also share one distribution.
    base = df.withColumn("_swchunk", chunk)
    # Degenerate-signature guard (ADVICE r17 low): with an empty
    # part_cols list a zero-field struct would become the repartition/
    # window/join key — skip _swkey entirely and key on the chunk alone.
    key_cols = ["_swchunk"]
    if part:
        base = base.withColumn("_swkey", F.struct(*[F.col(p) for p in part]))
        key_cols = ["_swkey", "_swchunk"]
    # Explicit reuse boundary (r17, the _chunked_local_merge r15 fix
    # applied here): ``base`` feeds BOTH the windowed data pass and the
    # chunk-summary aggregate. Left implicit, Catalyst plans the two
    # branches from independently-pruned copies of the whole upstream
    # subtree — for pileup that re-executed the reads distinct, the
    # binned region join, the event explode and the boundary aggregate
    # TWICE (plans/r17/pileup_depth_histogram_before.txt: operators
    # (37)-(69) mirror (1)-(36) with zero ReusedExchange). The explicit
    # repartition replaces the ENSURE_REQUIREMENTS exchange the window
    # needed anyway, and both branches now read it via ReusedExchange —
    # upstream runs once.
    base = base.repartition(*[F.col(k) for k in key_cols])
    if pre_agg is not None:
        # Fused position aggregate (r18): group keys = (key, chunk, pos)
        # — a SUPERSET of the repartition keys, so the aggregate reuses
        # the exchange above instead of shuffling the event table a
        # second time on (part, pos). The chunk is a function of the
        # position, so the groups are exactly the (part, pos) groups the
        # callers previously built upstream. The part columns are then
        # re-projected out of the struct key (the struct itself is
        # dropped on return).
        base = base.groupBy(*key_cols, pos_col).agg(*pre_agg)
        if part:
            base = base.select(
                "*", *[F.col(f"_swkey.{p}").alias(p) for p in part]
            )
    # Two window families sharing ONE exchange: ascending specs run as
    # growing prefix frames over the ascending sort, descending specs as
    # growing prefix frames over the DESCENDING sort of the same
    # partitioning (the second Window node adds a Sort, never an
    # Exchange). NEVER use (current → UNBOUNDED FOLLOWING) frames for
    # the suffix scans: Spark's unbounded-FOLLOWING frame is recomputed
    # from scratch per row — O(rows²) per partition (an 82 s multiinter
    # at 2 M rows vs ~2 s with the reversed-sort prefix form), while the
    # unbounded-PRECEDING frame grows incrementally in O(rows).
    wasc = Window.partitionBy(*key_cols).orderBy(F.col(pos_col).asc())
    wdesc = Window.partitionBy(*key_cols).orderBy(F.col(pos_col).desc())
    frames = {
        ("asc", False): wasc.rangeBetween(Window.unboundedPreceding, 0),
        ("asc", True): wasc.rangeBetween(Window.unboundedPreceding, -1),
        # descending order flips the meaning: "preceding" = larger pos
        ("desc", False): wdesc.rangeBetween(Window.unboundedPreceding, 0),
        ("desc", True): wdesc.rangeBetween(Window.unboundedPreceding, -1),
    }
    basew = base.select(
        "*",
        *[
            getattr(F, op)(val).over(frames[(d, st)]).alias(f"_loc_{out}")
            for val, op, out, d, st in sp
        ],
    )
    # Chunk totals -> exclusive per-partition prefix/suffix over the
    # summary (ONE row per non-empty chunk — the only partition-serial
    # stage, and it is O(#chunks), not O(rows)). Strictness never
    # reaches here: equal positions share a chunk. Derived from the
    # PRE-window frame so the branch shares the repartition exchange
    # above (the window columns would be pruned out of this branch
    # anyway, but deriving from ``base`` keeps the two subtrees
    # byte-identical below the exchange).
    cs = base.groupBy(*key_cols).agg(
        *[getattr(F, op)(val).alias(f"_tot_{out}") for val, op, out, _, _ in sp]
    )
    sum_part = ["_swkey"] if part else []
    wc_asc = Window.partitionBy(*sum_part).orderBy(F.col("_swchunk").asc())
    wc_desc = Window.partitionBy(*sum_part).orderBy(F.col("_swchunk").desc())
    off_frames = {
        # prefix frames in both directions (same O(rows) rationale as the
        # data pass — the summary is tiny, but asof's time_chunk can make
        # it #keys x #chunks rows)
        "asc": wc_asc.rowsBetween(Window.unboundedPreceding, -1),
        "desc": wc_desc.rowsBetween(Window.unboundedPreceding, -1),
    }
    cs = cs.select(
        *key_cols,
        *[
            getattr(F, op)(f"_tot_{out}").over(off_frames[d]).alias(f"_off_{out}")
            for _, op, out, d, _ in sp
        ],
    )
    if broadcast_summary is True:
        cs = F.broadcast(cs)
    # Equi-join on the struct key: null-safe (struct equality compares
    # fields null-first, so NULL partition values match themselves) AND
    # co-partitioned with the window pass — no extra exchange of the data.
    out_df = basew.join(cs, on=key_cols, how="left")
    for _, op, out, _, _ in sp:
        out_df = out_df.withColumn(
            out, _combine(op, F.col(f"_loc_{out}"), F.col(f"_off_{out}"))
        )
    return out_df.drop(
        *key_cols,
        *[f"_loc_{o}" for _, _, o, _, _ in sp],
        *[f"_off_{o}" for _, _, o, _, _ in sp],
    )


def chunked_running_agg(
    df: DataFrame,
    part_cols: Sequence[str],
    pos_col: str,
    specs: Sequence[tuple],
    descending: bool = False,
    chunk_size: int | None = None,
    broadcast_summary: bool | None = None,
) -> DataFrame:
    """Running aggregates in one direction — a thin wrapper over
    :func:`chunked_scan` kept for call-site brevity. ``specs`` are
    ``(value, op, output_name)`` triples; ``descending=True`` makes every
    spec a suffix scan. Inclusive range-frame tie semantics (rows at one
    position share the value — see the module docstring)."""
    return chunked_scan(
        df,
        part_cols,
        pos_col,
        [(val, op, out, "desc" if descending else "asc") for val, op, out in specs],
        chunk_size=chunk_size,
        broadcast_summary=broadcast_summary,
    )


def chunked_lead_pos(
    df: DataFrame,
    part_cols: Sequence[str],
    pos_col: str,
    out: str = "_next",
    chunk_size: int | None = None,
) -> DataFrame:
    """Add ``out`` = the next DISTINCT ``pos_col`` per partition (null on
    the last position) — the strict-suffix min of the position itself,
    via :func:`chunked_scan`. When a consumer also needs running
    aggregates, fuse this spec into ITS ``chunked_scan`` call instead of
    calling both."""
    return chunked_scan(
        df,
        part_cols,
        pos_col,
        [(F.col(pos_col), "min", out, "desc", True)],
        chunk_size=chunk_size,
    )
