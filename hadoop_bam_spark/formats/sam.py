"""SAM text format: header + alignment-line codec.

Reference behavior being reproduced (NOT ported code — semantics only):
- line-oriented records, 11 mandatory tab-separated fields + typed tags
  (reference SAMInputFormat.java:39-56, SAMRecordReader.java:67-147);
- header lines start with '@' and carry the sequence dictionary
  (@SQ SN:<name> LN:<len>) read once on the driver
  (reference util/SAMHeaderReader.java:48-75);
- '=' in RNEXT means "same as RNAME"; '*' means missing;
- 1-based POS; 0 means unmapped/unplaced.

The reference needs a header re-injection hack for mid-file splits
(SAMRecordReader.java:183-330, WorkaroundingStream); Spark's text source
already yields whole lines per split, so records are simply
``filter(NOT startswith('@'))`` — the hack disappears by construction.

Two layers:
- Column-expression parsers/formatters (JVM-side, codegen) for DataFrame
  pipelines;
- plain-Python parse/format for the DataSource readers and tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The 11 mandatory SAM columns + tags (SURVEY.md §1.5 schema).
SAM_SCHEMA = T.StructType(
    [
        T.StructField("qname", T.StringType(), False),
        T.StructField("flag", T.IntegerType(), False),
        T.StructField("rname", T.StringType(), True),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("mapq", T.IntegerType(), False),
        T.StructField("cigar", T.StringType(), True),
        T.StructField("rnext", T.StringType(), True),
        T.StructField("pnext", T.IntegerType(), True),
        T.StructField("tlen", T.IntegerType(), True),
        T.StructField("seq", T.StringType(), True),
        T.StructField("qual", T.StringType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


# ---------------------------------------------------------------------------
# Header model
# ---------------------------------------------------------------------------

@dataclass
class SAMHeader:
    """Parsed SAM header: raw text + the sequence dictionary."""

    lines: list[str] = field(default_factory=list)
    # contig name -> (index, length)
    sequences: dict[str, tuple[int, int]] = field(default_factory=dict)
    sort_order: str = "unknown"

    @property
    def text(self) -> str:
        return "".join(line + "\n" for line in self.lines)

    def ref_index(self, name: Optional[str]) -> int:
        if name is None or name in ("*", "="):
            return -1
        entry = self.sequences.get(name)
        return entry[0] if entry else -1

    def with_sort_order(self, so: str) -> "SAMHeader":
        """Return a copy stamped with @HD SO:<so> (reference
        util/GetSortedBAMHeader.java:35-57 stamps SO:coordinate)."""
        out = [ln for ln in self.lines if not ln.startswith("@HD")]
        out.insert(0, f"@HD\tVN:1.6\tSO:{so}")
        hdr = SAMHeader(lines=out, sequences=dict(self.sequences), sort_order=so)
        return hdr


def parse_header(lines) -> SAMHeader:
    """Parse '@'-prefixed header lines (driver-side, once per file)."""
    hdr = SAMHeader()
    seq_idx = 0
    for raw in lines:
        line = raw.rstrip("\n")
        if not line.startswith("@"):
            break
        hdr.lines.append(line)
        fields = line.split("\t")
        tag = fields[0]
        if tag == "@SQ":
            kv = dict(f.split(":", 1) for f in fields[1:] if ":" in f)
            name = kv.get("SN")
            if name:
                hdr.sequences[name] = (seq_idx, int(kv.get("LN", 0)))
                seq_idx += 1
        elif tag == "@HD":
            kv = dict(f.split(":", 1) for f in fields[1:] if ":" in f)
            hdr.sort_order = kv.get("SO", "unknown")
    return hdr


def read_header(path: str, open_fn=open) -> SAMHeader:
    """Read the header from the start of a SAM file (driver-side)."""
    lines = []
    with open_fn(path, "rt") as fh:
        for line in fh:
            if not line.startswith("@"):
                break
            lines.append(line)
    return parse_header(lines)


# ---------------------------------------------------------------------------
# Typed tag value representation (shared with the BAM binary codec)
# ---------------------------------------------------------------------------

#: Types usable in an explicit "TYPE:value" tag map value.
TAG_PREFIX_TYPES = "AcCsSiIfZH"

#: Strict SAM integer / float (spec regexes; Python int()/float() are looser —
#: they accept underscores and surrounding whitespace).
_SAM_INT_RE = re.compile(r"^[-+]?[0-9]+$")
_SAM_FLOAT_RE = re.compile(
    r"^[-+]?(?:(?:[0-9]+\.[0-9]*|\.[0-9]+)(?:[eE][-+]?[0-9]+)?"
    r"|[0-9]+[eE][-+]?[0-9]+)$"
)


def guess_tag_encoding(v: str) -> tuple[str, Optional[str]]:
    """The (kind, array_subtype) the bare tag encoder picks for a plain value
    string: 'prefix' (explicit TYPE:), 'int', 'array', 'float', or 'z'."""
    if len(v) >= 2 and v[1] == ":" and v[0] in TAG_PREFIX_TYPES:
        return "prefix", v[0]
    # strict SAM integer (int() would also accept '1_0', ' 5 ', ...)
    if _SAM_INT_RE.match(v):
        return "int", None
    if len(v) >= 2 and v[0] in "cCsSiIf" and v[1] == ",":
        return "array", v[0]
    if _SAM_FLOAT_RE.match(v):
        return "float", None
    return "z", None


def tag_value_repr(typ: str, s: str, array_sub: Optional[str] = None) -> str:
    """Canonical map-value string for a decoded tag: plain when the bare
    encoder would reproduce the same wire type, else 'TYPE:'-prefixed so
    A-chars, hex arrays, integral floats, and numeric-looking Z strings
    round-trip byte-for-byte (int widths normalize to 'i', as SAM text does;
    the reference preserves htsjdk tag types exactly)."""
    kind, sub = guess_tag_encoding(s)
    if typ in "cCsSiI":
        ok = kind == "int"
    elif typ == "f":
        ok = kind == "float"
    elif typ == "Z":
        ok = kind == "z"
    elif typ == "B":
        ok = kind == "array" and sub == array_sub
    else:  # A, H never survive a bare guess
        ok = False
    return s if ok else f"{typ}:{s}"


def format_tag(tag: str, v: str) -> str:
    """Map value string -> SAM text TAG:TYPE:VALUE field."""
    kind, sub = guess_tag_encoding(v)
    if kind == "prefix":
        return f"{tag}:{v[0]}:{v[2:]}"
    if kind == "int":
        return f"{tag}:i:{v}"
    if kind == "array":
        return f"{tag}:B:{v}"
    if kind == "float":
        return f"{tag}:f:{v}"
    return f"{tag}:Z:{v}"


# ---------------------------------------------------------------------------
# Python row codec (executor-side for the DataSource; tests)
# ---------------------------------------------------------------------------

def parse_sam_line(line: str) -> Optional[tuple]:
    """One SAM alignment line -> tuple matching SAM_SCHEMA (None for header)."""
    if not line or line.startswith("@"):
        return None
    f = line.rstrip("\n").split("\t")
    if len(f) < 11:
        raise ValueError(f"SAM line has {len(f)} fields, expected >= 11")
    rname = None if f[2] == "*" else f[2]
    rnext = f[6]
    if rnext == "=":
        rnext = rname
    elif rnext == "*":
        rnext = None
    tags = {}
    for tag in f[11:]:
        parts = tag.split(":", 2)
        if len(parts) == 3:
            typ, val = parts[1], parts[2]
            sub = val[0] if typ == "B" and len(val) >= 2 and val[1] == "," else None
            tags[parts[0]] = tag_value_repr(typ, val, sub)
    return (
        f[0],
        int(f[1]),
        rname,
        int(f[3]),
        int(f[4]),
        None if f[5] == "*" else f[5],
        rnext,
        int(f[7]) if f[7] != "*" else None,
        int(f[8]) if f[8] != "*" else None,
        None if f[9] == "*" else f[9],
        None if f[10] == "*" else f[10],
        tags,
    )


def format_sam_line(row) -> str:
    """Inverse of parse_sam_line; ``row`` is any object with SAM field attrs
    or a tuple in SAM_SCHEMA order."""
    if isinstance(row, tuple):
        (qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen, seq, qual, tags) = row
    else:
        qname, flag, rname, pos, mapq, cigar = (
            row.qname, row.flag, row.rname, row.pos, row.mapq, row.cigar,
        )
        rnext, pnext, tlen, seq, qual, tags = (
            row.rnext, row.pnext, row.tlen, row.seq, row.qual, row.tags,
        )
    if rnext is None:
        rnext_s = "*"
    elif rname is not None and rnext == rname:
        rnext_s = "="
    else:
        rnext_s = rnext
    fields = [
        qname,
        str(flag),
        rname if rname is not None else "*",
        str(pos),
        str(mapq),
        cigar if cigar is not None else "*",
        rnext_s,
        str(pnext) if pnext is not None else "0",
        str(tlen) if tlen is not None else "0",
        seq if seq is not None else "*",
        qual if qual is not None else "*",
    ]
    for k, v in (tags or {}).items():
        fields.append(format_tag(k, v))
    return "\t".join(fields)


# ---------------------------------------------------------------------------
# Column-expression codec (JVM-side — the fast path for DataFrame pipelines)
# ---------------------------------------------------------------------------

def sam_line_expr(
    qname: Column,
    flag: Column,
    rname: Column,
    pos: Column,
    mapq: Column,
    cigar: Column = None,
    rnext: Column = None,
    pnext: Column = None,
    tlen: Column = None,
    seq: Column = None,
    qual: Column = None,
) -> Column:
    """Format the 11 mandatory SAM fields as one tab-joined line, JVM-side."""

    def opt(col, default):
        return F.lit(default) if col is None else F.coalesce(col.cast("string"), F.lit(default))

    return F.concat_ws(
        "\t",
        qname,
        flag.cast("string"),
        opt(rname, "*"),
        pos.cast("string"),
        mapq.cast("string"),
        opt(cigar, "*"),
        opt(rnext, "*"),
        opt(pnext, "0"),
        opt(tlen, "0"),
        opt(seq, "*"),
        opt(qual, "*"),
    )


def parse_sam_line_cols(line: Column) -> Column:
    """Parse a SAM line into a struct of the 11 mandatory typed fields,
    entirely with JVM expressions (split + element_at + casts)."""
    f = F.split(line, "\t")

    def at(i: int) -> Column:
        return F.element_at(f, i)

    rname = F.when(at(3) == "*", F.lit(None).cast("string")).otherwise(at(3))
    return F.struct(
        at(1).alias("qname"),
        at(2).cast("long").alias("flag"),
        rname.alias("rname"),
        at(4).cast("long").alias("pos"),
        at(5).cast("long").alias("mapq"),
        F.when(at(6) == "*", F.lit(None).cast("string")).otherwise(at(6)).alias("cigar"),
        F.when(at(7) == "=", rname)
        .when(at(7) == "*", F.lit(None).cast("string"))
        .otherwise(at(7))
        .alias("rnext"),
        at(8).cast("long").alias("pnext"),
        at(9).cast("long").alias("tlen"),
        F.when(at(10) == "*", F.lit(None).cast("string")).otherwise(at(10)).alias("seq"),
        F.when(at(11) == "*", F.lit(None).cast("string")).otherwise(at(11)).alias("qual"),
    ).alias("r")
