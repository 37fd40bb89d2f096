"""Format-layer throughput micro-bench: write + scan MB/s for the binary
genomics formats at a bench-realistic size.

Usage: python -m hadoop_bam_spark.tools.bench_formats [n_reads] [workdir]
Prints one JSON object per format: output bytes, write seconds, scan
seconds, write/scan MB/s (scan = spark.read.format(...).count() over the
merged file with default splits).

This measures the engine's own I/O path (distributed part writes + driver
merge + index-aligned splittable scans) at single-node parallelism — the
number to hold against the reference's single-node htsjdk throughput.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _seq_expr():
    """Per-read pseudo-random 100 bp sequence (md5-derived, deterministic):
    realistic per-record entropy so BGZF compression ratios are honest."""
    hexes = F.concat(
        *[F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i)))) for i in range(4)]
    )
    return F.substring(
        F.translate(hexes, "0123456789abcdef", "ACGTACGTACGTACGT"), 1, 100
    )


def _qual_expr():
    hexes = F.concat(
        *[F.md5(F.concat(F.lit(str(i)), F.col("id").cast("string"))) for i in range(4)]
    )
    return F.substring(
        F.translate(hexes, "0123456789abcdef", "!#%')+-/13579;=?"), 1, 100
    )


def _reads_df(spark, n: int):
    seq = _seq_expr()
    qual = _qual_expr()
    return spark.range(n).select(
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("qname"),
        (F.col("id") % 2 * 16).cast("int").alias("flag"),
        F.concat(F.lit("chr"), (F.col("id") % 4 + 1).cast("string")).alias(
            "rname"
        ),
        (F.col("id") % 1_000_000 + 1).cast("int").alias("pos"),
        F.lit(60).cast("int").alias("mapq"),
        F.lit("100M").alias("cigar"),
        F.lit(None).cast("string").alias("rnext"),
        F.lit(0).cast("int").alias("pnext"),
        F.lit(0).cast("int").alias("tlen"),
        seq.alias("seq"),
        qual.alias("qual"),
        F.create_map(
            F.lit("NM"), (F.col("id") % 5).cast("string")
        ).alias("tags"),
    )


def _variants_df(spark, n: int):
    return spark.range(n).select(
        F.concat(F.lit("chr"), (F.col("id") % 4 + 1).cast("string")).alias(
            "contig"
        ),
        (F.col("id") % 1_000_000 + 1).cast("long").alias("start"),
        (F.col("id") % 1_000_000 + 1).cast("long").alias("end"),
        F.concat(F.lit("rs"), F.col("id").cast("string")).alias("id"),
        F.lit("A").alias("ref"),
        F.array(F.lit("G")).alias("alts"),
        F.lit(30.0).alias("qual"),
        F.array(F.lit("PASS")).alias("filters"),
        F.create_map(F.lit("DP"), (F.col("id") % 100).cast("string")).alias(
            "info"
        ),
        F.array(
            F.struct(
                F.lit("s1").alias("sample"),
                F.lit("0/1").alias("gt"),
                F.create_map(F.lit("GT"), F.lit("0/1")).alias("fields"),
            )
        ).alias("genotypes"),
    )


def _variants_rich_df(spark, n: int):
    """Real-cohort FORMAT shape: 3 samples, GT:DP:GQ:PL with per-record
    varying values and spec-missing cells — the data that used to bound
    BCF write at the scalar indiv encoder (~8 krec/s) before the r9
    numpy fast path."""
    def geno(s):
        gt = F.element_at(
            F.array(F.lit("0/0"), F.lit("0/1"), F.lit("1/1")),
            ((F.col("id") + s) % 3 + 1).cast("int"),
        )
        dp = F.when(
            (F.col("id") + s) % 4 == 0, F.lit(None).cast("string")
        ).otherwise(((F.col("id") * 7 + s) % 100).cast("string"))
        gq = ((F.col("id") * 3 + s) % 99).cast("string")
        pl = F.concat_ws(
            ",",
            ((F.col("id") + s) % 255).cast("string"),
            F.lit("0"),
            ((F.col("id") * 5 + s) % 255).cast("string"),
        )
        return F.struct(
            F.lit(f"s{s}").alias("sample"),
            gt.alias("gt"),
            F.map_from_arrays(
                F.array(F.lit("GT"), F.lit("DP"), F.lit("GQ"), F.lit("PL")),
                F.array(gt, dp, gq, pl),
            ).alias("fields"),
        )

    return spark.range(n).select(
        F.concat(F.lit("chr"), (F.col("id") % 4 + 1).cast("string")).alias(
            "contig"
        ),
        (F.col("id") % 1_000_000 + 1).cast("long").alias("start"),
        (F.col("id") % 1_000_000 + 1).cast("long").alias("end"),
        F.concat(F.lit("rs"), F.col("id").cast("string")).alias("id"),
        F.lit("A").alias("ref"),
        F.array(F.lit("G")).alias("alts"),
        F.lit(30.0).alias("qual"),
        F.array(F.lit("PASS")).alias("filters"),
        F.create_map(F.lit("DP"), (F.col("id") % 100).cast("string")).alias(
            "info"
        ),
        F.array(geno(1), geno(2), geno(3)).alias("genotypes"),
    )


def _fastq_df(spark, n: int):
    return spark.range(n).select(
        F.concat(F.lit("read"), F.col("id").cast("string")).alias("name"),
        _seq_expr().alias("sequence"),
        _qual_expr().alias("quality"),
        F.lit(None).cast("string").alias("instrument"),
        F.lit(None).cast("long").alias("run_number"),
        F.lit(None).cast("string").alias("flowcell_id"),
        F.lit(None).cast("long").alias("lane"),
        F.lit(None).cast("long").alias("tile"),
        F.lit(None).cast("long").alias("xpos"),
        F.lit(None).cast("long").alias("ypos"),
        F.lit(None).cast("long").alias("read"),
        F.lit(True).alias("filter_passed"),
        F.lit(None).cast("long").alias("control_number"),
        F.lit(None).cast("string").alias("index_sequence"),
    )


def _features_df(spark, n: int):
    """BED_SCHEMA features, coordinate-sorted (tabix precondition)."""
    df = spark.range(n)
    start = (F.col("id") * 37) % 1_000_000 + 1
    return df.select(
        F.concat(F.lit("chr"), ((F.col("id") % 4) + 1).cast("string"))
        .alias("contig"),
        start.cast("long").alias("start"),
        (start + (F.col("id") % 180) + 20).cast("long").alias("end"),
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 1001).cast("int").alias("score"),
        F.when(F.col("id") % 2 == 0, "+").otherwise("-").alias("strand"),
        F.lit(None).cast("array<string>").alias("rest"),
    ).orderBy("contig", "start")


def _track_df(spark, n: int):
    """BEDGRAPH_SCHEMA coverage track, coordinate-sorted."""
    df = spark.range(n)
    start = (F.col("id") * 41) % 1_000_000 + 1
    return df.select(
        F.concat(F.lit("chr"), ((F.col("id") % 4) + 1).cast("string"))
        .alias("contig"),
        start.cast("long").alias("start"),
        (start + 99).cast("long").alias("end"),
        ((F.col("id") % 500) / 4.0).alias("value"),
    ).orderBy("contig", "start")


def _gff_df(spark, n: int):
    """GFF_SCHEMA features, coordinate-sorted."""
    df = spark.range(n)
    start = (F.col("id") * 43) % 1_000_000 + 1
    return df.select(
        F.concat(F.lit("chr"), ((F.col("id") % 4) + 1).cast("string"))
        .alias("contig"),
        F.lit("bench").alias("source"),
        F.when(F.col("id") % 3 == 0, "gene").otherwise("exon").alias("type"),
        start.cast("long").alias("start"),
        (start + (F.col("id") % 900) + 100).cast("long").alias("end"),
        ((F.col("id") % 400) / 8.0).alias("score"),
        F.when(F.col("id") % 2 == 0, "+").otherwise("-").alias("strand"),
        (F.col("id") % 3).cast("int").alias("phase"),
        F.create_map(
            F.lit("ID"), F.concat(F.lit("g"), F.col("id").cast("string")),
            F.lit("biotype"), F.lit("protein_coding"),
        ).alias("attributes"),
    ).orderBy("contig", "start")


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 200_000
    workdir = pos[1] if len(pos) > 1 else tempfile.mkdtemp(
        prefix="hbs_fmt_bench_")
    only, reps = None, 1
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--reps="):
            # warm-write repetitions, INTERLEAVED across formats (rep 1
            # of every format, then rep 2, ...) so a drift in host load
            # mid-run cannot masquerade as a per-format regression —
            # the r11 cram-rr-vs-rans ordering artifact this flag
            # exists to rule out. Best-of is reported; all samples kept.
            reps = int(a.split("=", 1)[1])
    os.makedirs(workdir, exist_ok=True)

    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.sam import SAMHeader
    from hadoop_bam_spark.formats.vcf import VCFHeader
    from hadoop_bam_spark.session import get_spark
    from hadoop_bam_spark.sources import register_all

    spark = get_spark("bench_formats")
    register_all(spark)

    hdr = SAMHeader()
    hdr.lines = ["@HD\tVN:1.6\tSO:unsorted"]
    for i in range(4):
        hdr.lines.append(f"@SQ\tSN:chr{i + 1}\tLN:1050000")
        hdr.sequences[f"chr{i + 1}"] = (i, 1050000)
    refs = [(f"chr{i + 1}", 1050000) for i in range(4)]

    vhdr = VCFHeader()
    vhdr.lines = (
        ["##fileformat=VCFv4.2"]
        + [f"##contig=<ID=chr{i + 1},length=1050000>" for i in range(4)]
        + [
            # dictionary entries the BCF encoder indexes into
            '##FILTER=<ID=PASS,Description="pass">',
            '##INFO=<ID=DP,Number=1,Type=Integer,Description="depth">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="genotype">',
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="depth">',
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="genoqual">',
            '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="pl">',
        ]
    )
    vhdr.samples = ["s1"]
    vhdr.contigs = {f"chr{i + 1}": i for i in range(4)}

    vhdr_rich = VCFHeader()
    vhdr_rich.lines = list(vhdr.lines)
    vhdr_rich.samples = ["s1", "s2", "s3"]
    vhdr_rich.contigs = dict(vhdr.contigs)

    reads = _reads_df(spark, n).repartition(16).cache()
    reads.count()
    # reference-compressed CRAM workload: seqs MATCH a periodic FASTA
    # except one pseudo-random first base (~75% true mismatch rate at
    # position 1), so the RR=true encoder's compare+feature path is
    # exercised at realistic density
    pat64 = (
        "ACGTTGCAGGATCCTAAGCTTCGACATGGTACGACTGCTAAGGCATCGTTCAGCTAGCATGGCA"
    )
    fasta = os.path.join(workdir, "bench_ref.fa")
    contig = (pat64 * (1_050_000 // 64 + 1))[:1_050_000]
    with open(fasta, "w") as fh:
        for i in range(4):
            fh.write(f">chr{i + 1}\n")
            for j in range(0, len(contig), 70):
                fh.write(contig[j:j + 70] + "\n")
    pat3 = pat64 * 3
    mutbase = F.translate(
        F.substring(F.md5("qname"), 1, 1),
        "0123456789abcdef", "ACGTACGTACGTACGT",
    )
    rr_reads = reads.withColumn(
        "seq",
        F.concat(
            mutbase,
            F.expr(
                f"substr('{pat3}', CAST((pos - 1) % 64 AS INT) + 2, 99)"
            ),
        ),
    ).cache()
    rr_reads.count()
    variants = _variants_df(spark, n).repartition(16).cache()
    variants.count()
    # real-cohort FORMAT shape (3 samples, GT:DP:GQ:PL, missing cells):
    # exercises the r9 numpy indiv fast path end-to-end through the sink
    variants_rich = _variants_rich_df(spark, n).repartition(16).cache()
    variants_rich.count()
    fastq = _fastq_df(spark, n).repartition(16).cache()
    fastq.count()
    features = _features_df(spark, n).cache()
    features.count()
    track = _track_df(spark, n).cache()
    track.count()
    gff_feats = _gff_df(spark, n).cache()
    gff_feats.count()

    jobs = [
        ("bam", reads,
         lambda df, p: sinks.write_bam(df, p, hdr, refs=refs), {}),
        ("cram", reads,
         lambda df, p: sinks.write_cram(df, p, hdr, refs=refs), {}),
        ("cram-rr", rr_reads,
         lambda df, p: sinks.write_cram(
             df, p, hdr, refs=refs, reference=fasta),
         {"reference": fasta}),
        ("cram-rr-rans", rr_reads,
         lambda df, p: sinks.write_cram(
             df, p, hdr, refs=refs, reference=fasta, codecs="auto"),
         {"reference": fasta}),
        ("sam", reads, lambda df, p: sinks.write_sam(df, p, hdr), {}),
        ("vcf.bgz", variants,
         lambda df, p: sinks.write_vcf(df, p, vhdr), {}),
        ("bcf", variants, lambda df, p: sinks.write_bcf(df, p, vhdr), {}),
        ("bcf-cohort", variants_rich,
         lambda df, p: sinks.write_bcf(df, p, vhdr_rich), {}),
        ("fastq", fastq, lambda df, p: sinks.write_fastq(df, p), {}),
        ("qseq", fastq, lambda df, p: sinks.write_qseq(df, p), {}),
        ("bed.bgz", features,
         lambda df, p: sinks.write_bed(df, p, index_tbi=True), {}),
        ("bedgraph.bgz", track,
         lambda df, p: sinks.write_bedgraph(df, p, index_tbi=True), {}),
        ("gff.bgz", gff_feats,
         lambda df, p: sinks.write_gff(df, p, index_tbi=True), {}),
    ]
    if only is not None:
        jobs = [j for j in jobs if j[0] in only]
    results = {}
    # Writes get the same warm/cold split as scans: the first write's
    # Python workers pay one-time numpy/pyarrow imports and allocator
    # page-fault warmup; report steady-state warm numbers. With
    # --reps>1 the warm repetitions run INTERLEAVED across formats.
    cold: dict = {}
    warm: dict = {f: [] for f, *_ in jobs}

    def _clean(path):
        if os.path.exists(path):
            os.remove(path)
        for leftover in (path + ".sbi", path + ".tbi", path + ".bai",
                         path + ".crai"):
            if os.path.exists(leftover):
                os.remove(leftover)

    for fmt, df, write, _opts in jobs:
        path = os.path.join(workdir, f"bench.{fmt}")
        t0 = time.time()
        write(df, path)
        cold[fmt] = time.time() - t0
    for _rep in range(reps):
        for fmt, df, write, _opts in jobs:
            path = os.path.join(workdir, f"bench.{fmt}")
            _clean(path)
            t0 = time.time()
            write(df, path)
            warm[fmt].append(time.time() - t0)

    for fmt, df, write, scan_opts in jobs:
        path = os.path.join(workdir, f"bench.{fmt}")
        w_cold_sec = cold[fmt]
        w_sec = min(warm[fmt])
        size = os.path.getsize(path)
        reader_fmt = (
            "cram" if fmt.startswith("cram")
            else "bcf" if fmt.startswith("bcf")
            else fmt.split(".")[0] if fmt != "vcf.bgz" else "vcf"
        )

        def scan():
            # 2 MB splits: a bench-sized file parallelizes the way a 100 GB
            # one would with default 32 MB splits
            t0 = time.time()
            r = spark.read.format(reader_fmt).option(
                "split_size", "2000000"
            )
            for k, v in scan_opts.items():
                r = r.option(k, v)
            c = r.load(path).count()
            return c, time.time() - t0

        # First scan pays one-time Python-worker imports (numpy/pyarrow,
        # several seconds across workers) — a fixed cost, not throughput.
        # Report the warm number (what a long-running job sees) and keep
        # the cold one for transparency.
        cnt, cold_sec = scan()
        cnt, s_sec = scan()
        mb = size / 1e6
        results[fmt] = {
            "rows": cnt,
            "mb": round(mb, 3),
            "write_sec": round(w_sec, 2),
            "write_cold_sec": round(w_cold_sec, 2),
            "scan_sec": round(s_sec, 2),
            "scan_cold_sec": round(cold_sec, 2),
            "write_mb_s": round(mb / w_sec, 1),
            "scan_mb_s": round(mb / s_sec, 1),
            "write_krec_s": round(cnt / w_sec / 1000, 1),
            "scan_krec_s": round(cnt / s_sec / 1000, 1),
            "write_warm_samples": [round(s, 2) for s in warm[fmt]],
        }
        assert cnt == n, f"{fmt}: wrote {n}, read back {cnt}"
    print(json.dumps({"n_reads": n, "formats": results}))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
