"""Tabix index: build / binary round-trip / chunk queries / split pruning
through the VCF source (reference VCFInputFormat.java:388-472 tabix split
filtering, TestVCFInputFormat interval cases)."""

import random

import pytest

from hadoop_bam_spark.formats import bgzf, tabix


def _vcf_lines(n=8000, seed=11):
    rng = random.Random(seed)
    recs = []
    for i in range(n):
        contig = rng.choice(["1", "2"])
        pos = rng.randint(1, 4_000_000)
        recs.append((contig, pos, f"v{i}"))
    recs.sort(key=lambda r: (r[0], r[1]))
    return recs


def _write_vcf_bgz(path, recs):
    hdr = (
        "##fileformat=VCFv4.2\n"
        + "".join(f"##contig=<ID={c},length=10000000>\n" for c in ("1", "2"))
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    )
    with open(path, "wb") as fh:
        w = bgzf.BGZFWriter(fh)
        w.write(hdr.encode())
        for contig, pos, vid in recs:
            w.write(f"{contig}\t{pos}\t{vid}\tA\tT\t50\tPASS\t.\n".encode())
        w.close()


@pytest.fixture(scope="module")
def indexed_vcf(tmp_path_factory):
    d = tmp_path_factory.mktemp("tbx")
    p = str(d / "v.vcf.bgz")
    recs = _vcf_lines()
    _write_vcf_bgz(p, recs)
    tabix.write_tabix(tabix.build_tabix(p), p + ".tbi")
    return p, recs


class TestTabixFormat:
    def test_binary_roundtrip(self, indexed_vcf):
        p, _ = indexed_vcf
        idx = tabix.read_tabix(p + ".tbi")
        idx2 = tabix.TabixIndex.from_bytes(idx.to_bytes())
        assert idx2.names == idx.names == ["1", "2"]
        assert idx2.fmt == tabix.FMT_VCF
        for a, b in zip(idx.refs, idx2.refs):
            assert a.bins == b.bins and a.linear == b.linear

    def test_chunks_cover_interval(self, indexed_vcf):
        p, recs = indexed_vcf
        idx = tabix.read_tabix(p + ".tbi")
        beg0, end0 = 1_000_000, 1_500_000
        spans = idx.chunks_for("1", beg0, end0)
        assert spans
        # every matching record's line must start inside a span
        with open(p, "rb") as fh:
            for at, _, line in tabix._iter_lines_with_voffsets(fh):
                if line.startswith("#") or not line:
                    continue
                contig, pos = line.split("\t")[:2]
                if contig == "1" and beg0 < int(pos) <= end0:
                    assert any(b <= at < e for b, e in spans), line

    def test_empty_for_unknown_contig(self, indexed_vcf):
        p, _ = indexed_vcf
        idx = tabix.read_tabix(p + ".tbi")
        assert idx.chunks_for("chrX", 0, 1000) == []


class TestVCFSourceTabixPruning:
    SPLIT = 4096

    def _read(self, spark, path, **opts):
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        r = spark.read.format("vcf").option("split_size", str(self.SPLIT))
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(path)

    def test_interval_matches_filter(self, spark, indexed_vcf):
        path, recs = indexed_vcf
        df = self._read(spark, path, intervals="1:1000001-1500000")
        got = sorted(r.id for r in df.collect())
        want = sorted(
            vid for c, pos, vid in recs if c == "1" and 1_000_001 <= pos <= 1_500_000
        )
        assert got == want

    def test_index_prunes_partitions(self, spark, indexed_vcf):
        path, _ = indexed_vcf
        full = self._read(spark, path).rdd.getNumPartitions()
        pruned = self._read(
            spark, path, intervals="1:1000001-1100000"
        ).rdd.getNumPartitions()
        assert full > 2
        assert pruned < full

    def test_no_overlap_prunes_everything(self, spark, indexed_vcf):
        path, _ = indexed_vcf
        df = self._read(spark, path, intervals="1:9000000-9100000")
        assert df.count() == 0


class TestVCFCatalystFilterPushdown:
    """Plain DataFrame contig/start predicates (no intervals option) must
    reach the tabix index via pushFilters, with results identical to the
    unpruned plan (Catalyst re-applies every filter as residual)."""

    SPLIT = 4096

    def _read(self, spark, path):
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        return (
            spark.read.format("vcf")
            .option("split_size", str(self.SPLIT))
            .load(path)
        )

    def test_filter_results_match(self, spark, indexed_vcf):
        from pyspark.sql import functions as F

        path, recs = indexed_vcf
        df = self._read(spark, path).filter(
            (F.col("contig") == "1")
            & (F.col("start") >= 1_000_001)
            & (F.col("start") <= 1_500_000)
        )
        got = sorted(r.id for r in df.collect())
        want = sorted(
            vid for c, pos, vid in recs if c == "1" and 1_000_001 <= pos <= 1_500_000
        )
        assert got == want

    def test_filter_prunes_partitions(self, spark, indexed_vcf):
        from pyspark.sql import functions as F

        path, _ = indexed_vcf
        full = self._read(spark, path).rdd.getNumPartitions()
        pruned = (
            self._read(spark, path)
            .filter(
                (F.col("contig") == "1")
                & (F.col("start") >= 1_000_001)
                & (F.col("start") <= 1_100_000)
            )
            .rdd.getNumPartitions()
        )
        assert full > 2
        assert pruned < full

    def test_contig_only_filter_matches(self, spark, indexed_vcf):
        from pyspark.sql import functions as F

        path, recs = indexed_vcf
        df = self._read(spark, path).filter(F.col("contig") == "2")
        got = sorted(r.id for r in df.collect())
        assert got == sorted(vid for c, _, vid in recs if c == "2")
