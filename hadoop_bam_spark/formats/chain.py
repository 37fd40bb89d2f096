"""UCSC chain format — the input format of liftOver coordinate remapping.

Public spec: https://genome.ucsc.edu/goldenPath/help/chain.html. A chain is
a header line

    chain score tName tSize tStrand tStart tEnd qName qSize qStrand qStart qEnd [id]

followed by alignment-block lines ``size dt dq`` (the last line of a chain
is ``size`` alone), blank-line separated. All header coordinates are
0-based half-open ON THE NAMED STRAND; ``tStrand`` is always ``+``,
``qStrand`` may be ``-`` (the query interval then counts from the reverse
strand and a lifted position MIRRORS inside each block).

This module converts between that representation and the engine's interval
convention (1-based closed, plus-strand coordinates):

- :func:`parse_chain` walks each chain's block list (t += size+dt,
  q += size+dq) and emits one row per ungapped block:
  ``(src_contig, src_start, src_stop, dst_contig, dst_start, dst_strand,
  chain_id, score)`` where ``dst_start`` is the PLUS-strand 1-based low
  coordinate of the block's query side regardless of strand — exactly what
  ``operators.interval_join.interval_liftover`` consumes (its
  ``strand_col`` mirrors positions inside minus blocks).
- :func:`format_chain` writes blocks back as one single-block chain each —
  a valid chain file (liftOver accepts it) that needs no gap
  reconstruction.

Chain files are dimension-sized (MBs for whole-genome alignments), so
:func:`read_chain` parses on the driver and returns a broadcastable
DataFrame; there is deliberately no distributed scan.

The reference has no liftover machinery (Hadoop-BAM stops at record I/O);
this is paired with the pushdown layer the reference DOES have, reusing
its interval convention (BAMInputFormat.java:542-644).
"""

from __future__ import annotations

import gzip
from typing import Iterable, List, Tuple

#: parse_chain output row (engine convention, 1-based closed, plus-strand).
CHAIN_COLS = (
    "src_contig", "src_start", "src_stop",
    "dst_contig", "dst_start", "dst_strand", "chain_id", "score",
)

CHAIN_SCHEMA = (
    "src_contig string, src_start long, src_stop long, dst_contig string, "
    "dst_start long, dst_strand string, chain_id long, score long"
)


def parse_chain(text: str) -> List[Tuple]:
    """Chain-file text -> list of per-block CHAIN_COLS tuples.

    Raises ``ValueError`` on structural violations (bad field counts,
    non-integer numerics, block walk overrunning the declared t/q spans,
    tStrand != '+').
    """
    out: List[Tuple] = []
    header = None
    t = q = 0
    saw_last = False
    # Auto-assigned ids must never collide with EXPLICIT ids elsewhere in
    # the file (a sequential counter would: "chain ... 2" + an id-less
    # chain both becoming id 2). The explicit-id scan is LAZY: fully-id'd
    # files (the common liftOver case) never pay a second pass.
    explicit: set = set()
    scanned = [False]
    _next = [0]

    def next_auto() -> int:
        if not scanned[0]:
            scanned[0] = True
            for raw2 in text.splitlines():
                f2 = raw2.split()
                if f2 and f2[0] == "chain" and len(f2) == 13:
                    try:
                        explicit.add(int(f2[12]))
                    except ValueError:
                        pass
        _next[0] += 1
        while _next[0] in explicit:
            _next[0] += 1
        return _next[0]

    def flush_check():
        if header is not None and not saw_last:
            raise ValueError(
                f"chain {header[11]}: ended without a terminal size-only line"
            )

    for ln, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line:
            continue
        f = line.split()
        if f[0] == "chain":
            flush_check()
            if len(f) not in (12, 13):
                raise ValueError(f"line {ln}: chain header has {len(f)} fields")
            try:
                score = int(f[1])
                t_size, t_start, t_end = int(f[3]), int(f[5]), int(f[6])
                q_size, q_start, q_end = int(f[8]), int(f[10]), int(f[11])
            except ValueError as e:
                raise ValueError(f"line {ln}: non-integer chain field: {e}")
            if f[4] != "+":
                raise ValueError(f"line {ln}: tStrand must be '+', got {f[4]!r}")
            if f[9] not in ("+", "-"):
                raise ValueError(f"line {ln}: bad qStrand {f[9]!r}")
            if not (0 <= t_start <= t_end <= t_size):
                raise ValueError(f"line {ln}: target span outside tSize")
            if not (0 <= q_start <= q_end <= q_size):
                raise ValueError(f"line {ln}: query span outside qSize")
            cid = int(f[12]) if len(f) == 13 else next_auto()
            header = (score, f[2], t_size, t_start, t_end,
                      f[7], q_size, f[9], q_start, q_end, ln, cid)
            t, q = t_start, q_start
            saw_last = False
            continue
        if header is None:
            raise ValueError(f"line {ln}: block line before any chain header")
        if saw_last:
            raise ValueError(
                f"line {ln}: block line after the chain's terminal line"
            )
        if len(f) not in (1, 3):
            raise ValueError(f"line {ln}: block line has {len(f)} fields")
        try:
            size = int(f[0])
            dt = int(f[1]) if len(f) == 3 else 0
            dq = int(f[2]) if len(f) == 3 else 0
        except ValueError as e:
            raise ValueError(f"line {ln}: non-integer block field: {e}")
        if size <= 0 or dt < 0 or dq < 0:
            raise ValueError(f"line {ln}: negative/zero block geometry")
        (score, t_name, t_size, t_start, t_end,
         q_name, q_size, q_strand, q_start, q_end, _hln, cid) = header
        if t + size > t_end or q + size > q_end:
            raise ValueError(
                f"line {ln}: block overruns the declared chain span"
            )
        # Plus-strand low coordinate of the block's query side.
        if q_strand == "+":
            p_lo0 = q
        else:
            p_lo0 = q_size - (q + size)
        out.append((
            t_name, t + 1, t + size,          # src, 1-based closed
            q_name, p_lo0 + 1, q_strand,      # dst plus-strand low, 1-based
            cid, score,
        ))
        t += size + dt
        q += size + dq
        saw_last = len(f) == 1
    flush_check()
    return out


def format_chain(blocks: Iterable[Tuple], t_size=1 << 40,
                 q_size=None) -> str:
    """CHAIN_COLS tuples -> chain-file text, one single-block chain per
    tuple (a valid, liftOver-readable encoding that needs no gap
    reconstruction). ``t_size``/``q_size`` fill the declared chromosome
    sizes — each either a single int for every block or a
    ``{contig: size}`` mapping (required for multi-chromosome block
    lists, whose contigs need different declared sizes). Minus-strand
    blocks convert the plus-strand low coordinate back to reverse-strand
    qStart/qEnd AGAINST ``q_size``, so writing a '-' block REQUIRES the
    real destination chromosome size — a filler size would round-trip
    through this module's own parser (the mirror cancels) but make
    external liftOver land every minus-strand position on the wrong
    coordinate. Plus-strand-only block lists may omit it.

    Every block is validated against its declared sizes (``t_end <=
    t_size``, ``0 <= q_start`` and ``q_end <= q_size``): a q_size
    smaller than a minus block's plus-strand high coordinate would
    otherwise silently write a negative qStart — an invalid chain that
    external liftOver rejects or mis-lifts.
    """

    def _sz(val, contig: str, which: str):
        if val is None:
            return None
        if isinstance(val, int):
            return val
        try:
            return val[contig]
        except KeyError:
            raise ValueError(
                f"format_chain: {which} mapping has no size for contig "
                f"{contig!r}"
            )

    lines: List[str] = []
    for (sc, ss, se, dc, ds, strand, cid, score) in blocks:
        qs = _sz(q_size, dc, "q_size")
        if strand == "-" and qs is None:
            raise ValueError(
                "format_chain: minus-strand blocks need the real q_size "
                "(reverse-strand qStart/qEnd are computed against it)"
            )
        ts = _sz(t_size, sc, "t_size")
        if qs is None:
            qs = 1 << 40
        size = se - ss + 1
        if size <= 0:
            raise ValueError(
                f"format_chain: block {sc}:{ss}-{se} has non-positive size"
            )
        t_start, t_end = ss - 1, se
        if t_start < 0 or t_end > ts:
            raise ValueError(
                f"format_chain: block {sc}:{ss}-{se} outside declared "
                f"t_size {ts} (target span must satisfy 0 <= tStart and "
                f"tEnd <= tSize)"
            )
        p_lo0 = ds - 1
        if strand == "+":
            q_start, q_end = p_lo0, p_lo0 + size
        elif strand == "-":
            q_start, q_end = qs - (p_lo0 + size), qs - p_lo0
        else:
            raise ValueError(f"bad dst_strand {strand!r}")
        if q_start < 0 or q_end > qs:
            raise ValueError(
                f"format_chain: block {dc} (plus-strand low {ds}, strand "
                f"{strand}) outside declared q_size {qs} — a negative "
                "qStart/overrun qEnd writes an invalid chain"
            )
        lines.append(
            f"chain {score} {sc} {ts} + {t_start} {t_end} "
            f"{dc} {qs} {strand} {q_start} {q_end} {cid}"
        )
        lines.append(str(size))
        lines.append("")
    return "\n".join(lines) + ("\n" if lines else "")


def read_chain_file(path: str) -> List[Tuple]:
    """Parse a .chain / .chain.gz file (driver-side; chains are
    dimension-sized)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:  # type: ignore[operator]
        return parse_chain(fh.read())


def read_chain(spark, path: str):
    """Chain file -> broadcastable DataFrame in CHAIN_SCHEMA.

    Built through :func:`hadoop_bam_spark.session.local_df` (Arrow, one
    driver-side conversion): the plain list path re-ran one Python-RDD
    task per core on every broadcast build — ~12 CPU-s/run at local[32]
    for a 25-block chain, 75% of chain_liftover_roundtrip's bench CPU
    (r18 dissection).
    """
    from hadoop_bam_spark.session import local_df

    return local_df(spark, read_chain_file(path), CHAIN_SCHEMA)
