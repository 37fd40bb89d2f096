"""Standalone index/header CLI — parity with the reference's utility mains
(SURVEY.md §3.3):

- ``sbi``           index a BAM for split planning
                    (SplittingBAMIndexer.main, SplittingBAMIndexer.java:72-110)
- ``bai``           build the standard binning index (samtools index analog)
- ``tbi``           build a tabix index over a BGZF tab-text file
- ``crai``          index a CRAM's containers (samtools index analog)
- ``fai``           build a faidx sidecar over a FASTA (samtools faidx)
- ``csi``           build a CSI index over a BAM/BCF/BGZF-text file
                    (samtools/bcftools index -c analog)
- ``bgzfi``         index BGZF block offsets
                    (BGZFBlockIndexer.main, util/BGZFBlockIndexer.java:42-83)
- ``stats``         print an index summary
                    (SplittingBAMIndex.main, SplittingBAMIndex.java:116-154)
- ``sorted-header`` stamp SO:coordinate into a header-only BGZF BAM
                    (GetSortedBAMHeader.main, util/GetSortedBAMHeader.java:36-57)
- ``idxstats``      per-contig mapped/unmapped counts from BAI pseudo-bins
                    (samtools idxstats analog — index-only, no record scan)
- ``guess``         debug the split guesser at an arbitrary file offset
                    (BAMSplitGuesser.main, BAMSplitGuesser.java:341-400)

Usage: ``python -m hadoop_bam_spark.tools.index <cmd> <file> [options]``.
All paths route through the fs seam, so ``memory://`` and fsspec URLs work.
"""

from __future__ import annotations

import argparse
import struct
import sys

from hadoop_bam_spark import fs
from hadoop_bam_spark.formats import bam as bam_codec
from hadoop_bam_spark.formats import bgzf
from hadoop_bam_spark.formats.bai import build_bai, read_bai
from hadoop_bam_spark.formats.bgzf import build_bgzfi
from hadoop_bam_spark.formats.splitting_index import (
    DEFAULT_GRANULARITY,
    SplittingIndex,
)
from hadoop_bam_spark.formats.tabix import build_tabix, read_tabix, write_tabix


def build_sbi(
    path: str, granularity: int = DEFAULT_GRANULARITY, open_fn=None
) -> SplittingIndex:
    """One sequential pass over an existing BAM recording the virtual offset
    of every ``granularity``-th record (standalone-indexing mode of the
    reference's SplittingBAMIndexer, SplittingBAMIndexer.java:232-274)."""
    open_fn = open_fn or fs.open_file
    with open_fn(path, "rb") as fh:
        reader = bgzf.BGZFReader(fh)
        _, _, first = bam_codec.read_header(reader)
        voffsets: list[int] = []
        n = 0
        reader.seek_voffset(first)
        while True:
            at = reader.tell_voffset()
            head = reader.read(4)
            if len(head) < 4:
                break
            if n % granularity == 0:
                voffsets.append(at)
            (size,) = struct.unpack("<i", head)
            reader.read(size)
            n += 1
        file_length = fs.file_size(path)
    return SplittingIndex(granularity, voffsets, file_length)


def _cmd_sbi(args) -> int:
    out = args.output or args.file + (
        ".splitting-bai" if args.reference_layout else ".sbi"
    )
    idx = build_sbi(args.file, args.granularity)
    with fs.open_file(out, "wb") as fh:
        if args.reference_layout:
            idx.write_reference_layout(fh)
        else:
            idx.write(fh)
    print(f"{out}: {len(idx.voffsets)} offsets, granularity {idx.granularity}")
    return 0


def _cmd_bai(args) -> int:
    out = args.output or args.file + ".bai"
    idx = build_bai(args.file, open_fn=fs.open_file)
    with fs.open_file(out, "wb") as fh:
        idx.write(fh)
    n_bins = sum(len(r.bins) for r in idx.refs)
    print(f"{out}: {len(idx.refs)} refs, {n_bins} bins")
    return 0


def _cmd_tbi(args) -> int:
    out = args.output or args.file + ".tbi"
    idx = build_tabix(args.file, open_fn=fs.open_file)
    write_tabix(idx, out, open_fn=fs.open_file)
    print(f"{out}: {len(idx.names)} sequences")
    return 0


def _cmd_crai(args) -> int:
    from hadoop_bam_spark.formats import crai

    out = args.output or args.file + ".crai"
    entries = crai.build_crai(args.file, open_fn=fs.open_file)
    crai.write_crai(entries, out, open_fn=fs.open_file)
    print(f"{out}: {len(entries)} containers")
    return 0


def _cmd_csi(args) -> int:
    from hadoop_bam_spark.formats import csi as csi_mod

    out = args.output or args.file + ".csi"
    lower = args.file.lower()
    if lower.endswith(".bam"):
        idx = csi_mod.csi_from_bai(build_bai(args.file, open_fn=fs.open_file))
    elif lower.endswith(".bcf"):
        idx = csi_mod.build_csi(args.file, open_fn=fs.open_file)
    else:  # BGZF tab text (vcf.gz/.bgz): tabix-flavored CSI
        idx = csi_mod.csi_from_tabix(build_tabix(args.file, open_fn=fs.open_file))
    csi_mod.write_csi(idx, out, open_fn=fs.open_file)
    n_bins = sum(len(r.bins) for r in idx.refs)
    print(f"{out}: {len(idx.refs)} refs, {n_bins} bins "
          f"(min_shift={idx.min_shift}, depth={idx.depth})")
    return 0


def _cmd_fai(args) -> int:
    from hadoop_bam_spark.sinks import build_fai

    out = args.output or args.file + ".fai"
    build_fai(args.file, out)
    with fs.open_file(out, "r") as fh:
        n = sum(1 for _ in fh)
    print(f"{out}: {n} sequences")
    return 0


def _cmd_bgzfi(args) -> int:
    out = args.output or args.file + ".bgzfi"
    idx = build_bgzfi(args.file, granularity=args.granularity, open_fn=fs.open_file)
    with fs.open_file(out, "wb") as fh:
        idx.write(fh)
    print(f"{out}: {len(idx.offsets)} block offsets")
    return 0


def _cmd_stats(args) -> int:
    path = args.file
    with fs.open_file(path, "rb") as fh:
        if path.endswith(".sbi"):
            idx = SplittingIndex.read(fh)
            kind = "sbi"
        elif path.endswith(".splitting-bai"):
            idx = SplittingIndex.read_reference_layout(fh)
            kind = "splitting-bai"
        elif path.endswith(".bai"):
            b = read_bai(path, open_fn=fs.open_file)
            print(
                f"bai: {len(b.refs)} refs, "
                f"{sum(len(r.bins) for r in b.refs)} bins, "
                f"{sum(len(r.linear) for r in b.refs)} linear entries"
            )
            return 0
        elif path.endswith(".tbi"):
            t = read_tabix(path, open_fn=fs.open_file)
            print(f"tbi: sequences {t.names}")
            return 0
        elif path.endswith(".bgzfi"):
            b = bgzf.BGZFBlockIndex.read(fh)
            print(f"bgzfi: {len(b.offsets)} offsets, file size {b.file_size}")
            return 0
        elif path.endswith(".crai"):
            from hadoop_bam_spark.formats import crai as crai_mod

            entries = crai_mod.read_crai(path, open_fn=fs.open_file)
            n_mapped = sum(1 for e in entries if e.seq_id >= 0)
            print(
                f"crai: {len(entries)} entries "
                f"({n_mapped} single-ref, "
                f"{sum(1 for e in entries if e.seq_id == -2)} multi-ref, "
                f"{sum(1 for e in entries if e.seq_id == -1)} unmapped)"
            )
            return 0
        elif path.endswith(".csi"):
            from hadoop_bam_spark.formats import csi as csi_mod

            c = csi_mod.read_csi(path, open_fn=fs.open_file)
            names = csi_mod.names_from_aux(c.aux)
            print(
                f"csi: {len(c.refs)} refs, "
                f"{sum(len(r.bins) for r in c.refs)} bins, "
                f"min_shift={c.min_shift}, depth={c.depth}"
                + (f", sequences {names}" if names else "")
            )
            return 0
        else:
            print(f"unrecognized index extension: {path}", file=sys.stderr)
            return 2
    # reference prints the offset list for its splitting-bai main
    print(
        f"{kind}: {len(idx.voffsets)} offsets, granularity {idx.granularity}, "
        f"file length {idx.file_length}"
    )
    for v in idx.voffsets[: args.limit]:
        print(f"  {v >> 16}:{v & 0xFFFF}")
    return 0


def _cmd_sorted_header(args) -> int:
    with fs.open_file(args.file, "rb") as fh:
        reader = bgzf.BGZFReader(fh)
        header, refs, _ = bam_codec.read_header(reader)
    header = header.with_sort_order("coordinate")
    with fs.open_file(args.output, "wb") as fh:
        w = bgzf.BGZFWriter(fh, write_terminator=True)
        w.write(bam_codec.encode_header(header, refs))
        w.close()
    print(f"{args.output}: header stamped SO:coordinate")
    return 0


def _cmd_guess(args) -> int:
    with fs.open_file(args.file, "rb") as fh:
        reader = bgzf.BGZFReader(fh)
        _, refs, _ = bam_codec.read_header(reader)
        fh.seek(args.offset)
        buf = fh.read()
    v = bam_codec.guess_next_record_voffset(buf, args.offset, len(refs))
    if v is None:
        print(f"no record start found from offset {args.offset}")
        return 1
    print(f"offset {args.offset} -> record at {v >> 16}:{v & 0xFFFF}")
    return 0


def _cmd_idxstats(args) -> int:
    """samtools idxstats without scanning a record: contig, length,
    n_mapped, n_unmapped per reference from the BAI metadata pseudo-bins
    (bin 37450), then the '*' line with n_no_coor. Reads the BAM header
    only for names/lengths; given a bare .bai, prints ref indexes."""
    path = args.file
    if path.endswith(".bai"):
        bai_path, bam_path = path, None
    else:
        bai_path, bam_path = path + ".bai", path
    idx = read_bai(bai_path, open_fn=fs.open_file)
    names = lengths = None
    if bam_path is not None and fs.exists(bam_path):
        with fs.open_file(bam_path, "rb") as f:
            _hdr, refs, _end = bam_codec.read_header(bgzf.BGZFReader(f))
        names = [r[0] for r in refs]
        lengths = [r[1] for r in refs]
    for i, ref in enumerate(idx.refs):
        name = names[i] if names else str(i)
        length = lengths[i] if lengths else 0
        print(f"{name}\t{length}\t{max(ref.n_mapped, 0)}"
              f"\t{max(ref.n_unmapped, 0)}")
    print(f"*\t0\t0\t{int(idx.n_no_coor or 0)}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="hadoop_bam_spark.tools.index")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("sbi", help="build a splitting index over a BAM")
    s.add_argument("file")
    s.add_argument("-o", "--output")
    s.add_argument("-g", "--granularity", type=int, default=DEFAULT_GRANULARITY)
    s.add_argument(
        "--reference-layout",
        action="store_true",
        help="emit the reference .splitting-bai byte layout",
    )
    s.set_defaults(fn=_cmd_sbi)

    for name, fn, hlp in [
        ("bai", _cmd_bai, "build a BAI binning index over a BAM"),
        ("tbi", _cmd_tbi, "build a tabix index over a BGZF text file"),
        ("crai", _cmd_crai, "build a CRAI container index over a CRAM"),
        ("fai", _cmd_fai, "build a faidx sidecar over a FASTA"),
        ("csi", _cmd_csi,
         "build a CSI index (BAM/BCF/BGZF-text by extension, samtools -c analog)"),
    ]:
        s = sub.add_parser(name, help=hlp)
        s.add_argument("file")
        s.add_argument("-o", "--output")
        s.set_defaults(fn=fn)

    s = sub.add_parser("bgzfi", help="index BGZF block offsets")
    s.add_argument("file")
    s.add_argument("-o", "--output")
    s.add_argument("-g", "--granularity", type=int, default=1024)
    s.set_defaults(fn=_cmd_bgzfi)

    s = sub.add_parser("stats", help="print an index summary")
    s.add_argument("file")
    s.add_argument("--limit", type=int, default=10)
    s.set_defaults(fn=_cmd_stats)

    s = sub.add_parser(
        "sorted-header", help="write a header-only BAM stamped SO:coordinate"
    )
    s.add_argument("file")
    s.add_argument("output")
    s.set_defaults(fn=_cmd_sorted_header)

    s = sub.add_parser(
        "idxstats",
        help="per-contig mapped/unmapped counts from the .bai metadata "
        "pseudo-bins (samtools idxstats analog; no record scan)",
    )
    s.add_argument("file", help="a BAM with a .bai sidecar (or a .bai)")
    s.set_defaults(fn=_cmd_idxstats)

    s = sub.add_parser("guess", help="debug: guess next record from an offset")
    s.add_argument("file")
    s.add_argument("offset", type=int)
    s.set_defaults(fn=_cmd_guess)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
