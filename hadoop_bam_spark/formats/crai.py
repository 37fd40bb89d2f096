"""CRAI — the CRAM index (public hts-specs CRAM index definition).

Layout: gzip-compressed text, one line per indexed slice with six
tab-separated integers::

    seq_id  alignment_start  alignment_span  container_offset  slice_offset  slice_size

The reference's CRAM path depends on this sidecar for split planning
(CRAMInputFormat resolves container boundaries from it instead of walking
the data file). Here it serves the same two jobs:

- planning without data reads: the distinct container offsets ARE the
  split-alignment points (``container_offsets``);
- interval pruning: entries carry (seq_id, start, span), so containers
  provably not overlapping a query interval drop at plan time
  (``prune_offsets``), exactly like BAI chunk spans for BAM.

``build_crai`` emits one entry per container from the container headers
(header-only reads). Our writer produces one slice per container so this
is also per-slice; for foreign multi-slice files the entry is coarser
than samtools' per-slice lines but remains a valid, strictly-conservative
index (slice offset/size cover the whole body). Multi-reference
containers (seq_id -2) are never prunable and unmapped containers
(seq_id -1) prune only under interval queries, matching the BAM source's
bounded-traversal semantics.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, Optional


@dataclass(frozen=True)
class CRAIEntry:
    seq_id: int            # -1 unmapped, -2 multi-reference
    start: int             # 1-based alignment start (0 when unplaced)
    span: int
    container_offset: int  # absolute file offset of the container header
    slice_offset: int      # byte offset of the slice inside the body
    slice_size: int


def write_crai(entries: list[CRAIEntry], path: str, open_fn=open) -> None:
    text = "".join(
        f"{e.seq_id}\t{e.start}\t{e.span}\t{e.container_offset}\t"
        f"{e.slice_offset}\t{e.slice_size}\n"
        for e in entries
    )
    with open_fn(path, "wb") as fh:
        fh.write(gzip.compress(text.encode("ascii")))


def read_crai(path: str, open_fn=open) -> list[CRAIEntry]:
    with open_fn(path, "rb") as fh:
        raw = fh.read()
    entries = []
    for line in gzip.decompress(raw).decode("ascii").splitlines():
        if not line.strip():
            continue
        f = line.split("\t")
        if len(f) != 6:
            raise ValueError(f"malformed CRAI line: {line!r}")
        entries.append(CRAIEntry(*(int(x) for x in f)))
    return entries


def build_crai(path: str, open_fn=open) -> list[CRAIEntry]:
    """One entry per container from header-only reads (the slice spans the
    whole body past the first landmark — conservative but valid)."""
    from hadoop_bam_spark.formats.cram import iter_container_offsets

    entries = []
    for off, hdr in iter_container_offsets(path, open_fn=open_fn):
        slice_off = hdr.landmarks[0] if hdr.landmarks else 0
        entries.append(
            CRAIEntry(
                seq_id=hdr.ref_seq_id,
                start=hdr.start,
                span=hdr.span,
                container_offset=off,
                slice_offset=slice_off,
                slice_size=max(hdr.length - slice_off, 0),
            )
        )
    return entries


def container_offsets(entries: list[CRAIEntry]) -> list[int]:
    """Distinct container offsets in file order (multi-slice files repeat
    the offset per slice)."""
    return sorted({e.container_offset for e in entries})


def prune_offsets(
    entries: list[CRAIEntry],
    intervals: list[tuple[str, int, int]],
    refs: list[tuple[str, int]],
) -> list[int]:
    """Container offsets that may hold records overlapping any interval.

    Multi-reference containers (-2) always survive (their per-record refs
    are only known at decode time); unmapped containers (-1) never overlap
    a coordinate interval."""
    name_to_id = {name: i for i, (name, _ln) in enumerate(refs)}
    wanted: dict[int, list[tuple[int, int]]] = {}
    for contig, lo, hi in intervals:
        rid = name_to_id.get(contig)
        if rid is not None:
            wanted.setdefault(rid, []).append((lo, hi))
    keep = set()
    for e in entries:
        if e.seq_id == -2:
            keep.add(e.container_offset)
            continue
        spans = wanted.get(e.seq_id)
        if not spans:
            continue
        e_end = e.start + max(e.span, 1) - 1
        if any(e.start <= hi and lo <= e_end for lo, hi in spans):
            keep.add(e.container_offset)
    return sorted(keep)
