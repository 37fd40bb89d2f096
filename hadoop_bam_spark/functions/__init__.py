"""Scalar column-expression library (JVM-side, codegen-friendly — no UDFs).

Ports the reference's scalar-function surface (SURVEY.md §2.8) as pure
``pyspark.sql.functions`` compositions, so they stay inside whole-stage
codegen and never cross into Python at execution time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Quality-score re-encoding (reference SequencedFragment.java:229-309,
# constants FormatConstants.java:25-53)
# --------------------------------------------------------------------------

# Sanger Phred+33: chr(33)..chr(126); Illumina Phred+64: chr(64)..chr(126).
_ILLUMINA_ALPHABET = "".join(chr(c) for c in range(64, 127))  # phred 0..62
_SANGER_OF_ILLUMINA = "".join(chr(c - 31) for c in range(64, 127))
_SANGER_LOW = "".join(chr(c) for c in range(33, 96))  # phred 0..62
_ILLUMINA_OF_SANGER = "".join(chr(c + 31) for c in range(33, 96))


def phred64_to_phred33(qual: Column) -> Column:
    """Illumina Phred+64 → Sanger Phred+33 (chars shift by -31)."""
    return F.translate(qual, _ILLUMINA_ALPHABET, _SANGER_OF_ILLUMINA)


def phred33_to_phred64(qual: Column) -> Column:
    """Sanger Phred+33 → Illumina Phred+64 (chars shift by +31).

    Sanger phred values above 62 are outside the Illumina range and raise in
    the reference (FormatConstants: MAX_ILLUMINA_QUALITY=62); here they are
    left untranslated — validate with :func:`quality_in_range` first.
    """
    return F.translate(qual, _SANGER_LOW, _ILLUMINA_OF_SANGER)


def quality_in_range(qual: Column, offset: int = 33, max_phred: int = 93) -> Column:
    """True iff every char of ``qual`` is a valid phred+offset encoding.

    Mirrors SequencedFragment.verifyQuality (SequencedFragment.java:281-309).
    """
    lo, hi = offset, offset + max_phred
    return F.forall(
        F.transform(F.split(qual, ""), lambda c: F.ascii(c)),
        lambda a: (a >= lo) & (a <= hi) | (a == 0),  # trailing '' → ascii 0
    )


# --------------------------------------------------------------------------
# Base normalization (reference QseqInputFormat.java:403-409 and inverse
# QseqOutputFormat.java:113,118)
# --------------------------------------------------------------------------

def normalize_bases(seq: Column) -> Column:
    """QSEQ '.' no-call → 'N'."""
    return F.translate(seq, ".", "N")


def denormalize_bases(seq: Column) -> Column:
    """Inverse for QSEQ output: 'N' → '.'."""
    return F.translate(seq, "N", ".")


# --------------------------------------------------------------------------
# Illumina read ids (reference FastqInputFormat.java:93,349-381 and
# FastqOutputFormat.java:92-115)
# --------------------------------------------------------------------------

def parse_illumina_id(name: Column) -> list[Column]:
    """Parse 'instr:run:flowcell:lane:tile:x:y[/read]' into typed columns.

    Returns columns: instrument, run_number, flowcell_id, lane, tile, xpos,
    ypos, read_num (read_num null when no /N suffix).
    """
    return [
        F.regexp_extract(name, r"^([^:]+):", 1).alias("instrument"),
        F.regexp_extract(name, r"^[^:]+:([0-9]+):", 1).cast("long").alias("run_number"),
        F.regexp_extract(name, r"^[^:]+:[0-9]+:([^:]+):", 1).alias("flowcell_id"),
        F.regexp_extract(name, r":([0-9]+):[0-9]+:[0-9]+:[0-9]+/", 1)
        .cast("long")
        .alias("lane"),
        F.regexp_extract(name, r":([0-9]+):[0-9]+:[0-9]+/", 1).cast("long").alias("tile"),
        F.regexp_extract(name, r":([0-9]+):[0-9]+/", 1).cast("long").alias("xpos"),
        F.regexp_extract(name, r":([0-9]+)/", 1).cast("long").alias("ypos"),
        F.regexp_extract(name, r"/([0-9])$", 1).cast("long").alias("read_num"),
    ]


def make_illumina_id(
    instrument: Column,
    run_number: Column,
    flowcell_id: Column,
    lane: Column,
    tile: Column,
    xpos: Column,
    ypos: Column,
) -> Column:
    """Synthesize the Illumina id (reference FastqOutputFormat.java:92-115)."""
    return F.concat_ws(
        ":",
        instrument,
        run_number.cast("string"),
        flowcell_id,
        lane.cast("string"),
        tile.cast("string"),
        xpos.cast("string"),
        ypos.cast("string"),
    )


# --------------------------------------------------------------------------
# Coordinate keys (reference BAMRecordReader.java:59-120)
# --------------------------------------------------------------------------

_UNMAPPED_HIGH = 2147483647 * 4294967296  # Integer.MAX_VALUE << 32


def coordinate_key(ref_idx: Column, pos: Column, salt: Column | None = None) -> Column:
    """64-bit sort key: refIdx<<32 | 0-based pos; unmapped (ref_idx<0) sorts
    last with a deterministic spread hash in the low 32 bits (the reference
    murmur-hashes the record bytes — BAMRecordReader.java:80-110; any stable
    uniform 32-bit salt serves the same purpose)."""
    if salt is None:
        salt = F.lit(0)
    return F.when(
        ref_idx < 0, F.lit(_UNMAPPED_HIGH) + F.pmod(salt, F.lit(4294967296))
    ).otherwise(ref_idx.cast("long") * F.lit(4294967296) + pos.cast("long"))


def interval_overlaps(
    start_a: Column, stop_a: Column, start_b: Column, stop_b: Column
) -> Column:
    """Closed-interval overlap predicate (htsjdk Interval convention)."""
    return (start_a <= stop_b) & (start_b <= stop_a)
