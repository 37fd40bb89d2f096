"""fasta_consensus (operators/consensus.py) vs direct string editing."""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hadoop_bam_spark.operators.consensus import fasta_consensus


def _write_fasta(path, seqs, width=40):
    with open(path, "w") as fh:
        for name, seq in seqs.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i:i + width] + "\n")


@pytest.mark.parametrize("bin_size", [16384, 16])
def test_consensus_matches_string_edit(spark, tmp_path, bin_size):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    rng = random.Random(3)
    seqs = {f"c{i}": "".join(rng.choice("ACGT") for _ in range(300))
            for i in range(3)}
    p = tmp_path / "r.fa"
    _write_fasta(p, seqs)
    fasta = spark.read.format("fasta").load(str(p))
    sites = sorted(
        {(f"c{rng.randrange(3)}", rng.randint(1, 300)) for _ in range(60)}
    )
    variants = [(c, pos, seqs[c][pos - 1], rng.choice("ACGTN")) for c, pos in sites]
    # non-SNP rows must be dropped, duplicate sites collapse to max(alt)
    variants += [("c0", 5, "AC", "A"), ("c0", 7, "A", "ACGT")]
    variants += [("c1", 9, seqs["c1"][8], "A"), ("c1", 9, seqs["c1"][8], "G")]
    vdf = spark.createDataFrame(
        variants, "contig string, start long, ref string, alt string"
    )
    out = {
        (r["contig"], r["pos"]): r["seq"]
        for r in fasta_consensus(fasta, vdf, bin_size=bin_size).collect()
    }
    want = {c: list(s) for c, s in seqs.items()}
    for c, pos in sites:
        want[c][pos - 1] = dict(
            ((vc, vp), a) for vc, vp, _, a in variants if (vc, vp) == (c, pos)
        )[(c, pos)]
    want["c1"][8] = "G"  # duplicate site -> lexicographically largest alt
    stitched = {}
    for (c, pos), seq in sorted(out.items()):
        stitched[c] = stitched.get(c, "") + seq
        # chunk grid is preserved (pos/length unchanged by SNPs)
        assert len(seq) > 0
    assert stitched == {c: "".join(v) for c, v in want.items()}


def test_consensus_error_mode_and_validation(spark, tmp_path):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    p = tmp_path / "e.fa"
    _write_fasta(p, {"c1": "ACGTACGT"})
    fasta = spark.read.format("fasta").load(str(p))
    indel = spark.createDataFrame(
        [("c1", 2, "CG", "C")], "contig string, start long, ref string, alt string"
    )
    with pytest.raises(Exception, match="non-SNP"):
        fasta_consensus(fasta, indel, on_indel="error").collect()
    with pytest.raises(ValueError, match="on_indel"):
        fasta_consensus(fasta, indel, on_indel="warn")
    # drop mode: indel ignored, sequence unchanged
    rows = fasta_consensus(fasta, indel).collect()
    assert "".join(r["seq"] for r in sorted(rows, key=lambda r: r["pos"])) == "ACGTACGT"


def test_consensus_null_alt_is_not_silent(spark, tmp_path):
    """ADVICE r14: a null alt must never NULL-poison the spliced chunk —
    error/apply raise, drop filters it like any other malformed row."""
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    p = tmp_path / "n.fa"
    _write_fasta(p, {"c1": "ACGTACGT"})
    fasta = spark.read.format("fasta").load(str(p))
    bad = spark.createDataFrame(
        [("c1", 3, "G", None), ("c1", 5, "A", "T")],
        "contig string, start long, ref string, alt string",
    )
    with pytest.raises(Exception, match="non-SNP|null"):
        fasta_consensus(fasta, bad, on_indel="error").collect()
    with pytest.raises(Exception, match="null alt"):
        fasta_consensus(fasta, bad, on_indel="apply").collect()
    rows = sorted(fasta_consensus(fasta, bad).collect(), key=lambda r: r["pos"])
    got = "".join(r["seq"] for r in rows)
    assert got == "ACGTTCGT"  # the good SNP applied, no NULL chunk
    assert all(r["seq"] is not None for r in rows)


def _chunk_df(spark, seqs, chunk_len):
    rows = []
    for name, seq in seqs.items():
        for i in range(0, len(seq), chunk_len):
            rows.append((name, i + 1, seq[i:i + chunk_len]))
    return spark.createDataFrame(rows, "contig string, pos long, seq string")


def _brute_apply(seq, edits):
    """edits: sorted disjoint (pos, ref_len, alt) on 1-based coords."""
    out, cur = [], 0
    for pos, rlen, alt in sorted(edits):
        out.append(seq[cur:pos - 1])
        out.append(alt)
        cur = pos - 1 + rlen
    out.append(seq[cur:])
    return "".join(out)


@pytest.mark.parametrize("chunk_len", [7, 64])
def test_consensus_apply_indels_matches_string_edit(spark, chunk_len):
    """SNPs + insertions + deletions (incl. deletions spanning several
    chunk boundaries) against a direct string edit, plus the re-anchored
    position contract: output chunks tile [1, len] contiguously."""
    rng = random.Random(11)
    seqs = {f"c{i}": "".join(rng.choice("ACGT") for _ in range(200))
            for i in range(3)}
    edits = {}
    for c, seq in seqs.items():
        es, cur = [], 1
        while cur < len(seq) - 20:
            pos = cur + rng.randint(1, 8)
            kind = rng.randrange(3)
            if kind == 0:  # SNP
                es.append((pos, 1, rng.choice("ACGT")))
            elif kind == 1:  # deletion, often spanning chunk boundaries
                rlen = rng.randint(2, 18)
                es.append((pos, rlen, seq[pos - 1]))
            else:  # insertion (VCF-anchored)
                es.append((pos, 1, seq[pos - 1] + "".join(
                    rng.choice("ACGT") for _ in range(rng.randint(1, 5)))))
            cur = es[-1][0] + es[-1][1]
        edits[c] = es
    vrows = [
        (c, pos, seqs[c][pos - 1:pos - 1 + rlen], alt)
        for c, es in edits.items()
        for pos, rlen, alt in es
    ]
    vdf = spark.createDataFrame(
        vrows, "contig string, start long, ref string, alt string"
    )
    fasta = _chunk_df(spark, seqs, chunk_len)
    rows = sorted(
        fasta_consensus(fasta, vdf, on_indel="apply", bin_size=16).collect()
    )
    got = {}
    for r in rows:
        assert len(r["seq"]) > 0  # zero-length chunks are dropped
        # contiguous tiling in CONSENSUS coordinates
        assert r["pos"] == len(got.get(r["contig"], "")) + 1
        got[r["contig"]] = got.get(r["contig"], "") + r["seq"]
    want = {c: _brute_apply(seqs[c], edits[c]) for c in seqs}
    assert got == want


def test_consensus_apply_rejects_overlap_and_unspelled_ref(spark):
    fasta = _chunk_df(spark, {"c1": "ACGTACGTACGT"}, 6)
    overlap = spark.createDataFrame(
        [("c1", 2, "CGTA", "C"), ("c1", 4, "TA", "T")],
        "contig string, start long, ref string, alt string",
    )
    with pytest.raises(Exception, match="overlapping variant spans"):
        fasta_consensus(fasta, overlap, on_indel="apply").collect()
    unspelled = spark.createDataFrame(
        [("c1", 2, None, "CAA")],
        "contig string, start long, ref string, alt string",
    )
    with pytest.raises(Exception, match="spelled ref"):
        fasta_consensus(fasta, unspelled, on_indel="apply").collect()


def test_consensus_apply_snps_equals_snp_mode(spark):
    """With SNP-only variants, apply mode reproduces the drop-mode output
    exactly (lengths unchanged -> identical chunk grid)."""
    fasta = _chunk_df(spark, {"c1": "ACGTACGTACGT", "c2": "TTTTGGGG"}, 5)
    vdf = spark.createDataFrame(
        [("c1", 3, "G", "T"), ("c2", 8, None, "A")],
        "contig string, start long, ref string, alt string",
    )
    base = sorted(map(tuple, fasta_consensus(fasta, vdf).collect()))
    applied = sorted(
        map(tuple, fasta_consensus(fasta, vdf, on_indel="apply").collect())
    )
    assert base == applied


@pytest.mark.parametrize("on_indel", ["drop", "apply"])
def test_consensus_order_col_first_wins(spark, on_indel):
    """r16: with order_col the same-site dedup is bcftools' FIRST-record
    rule (min input rank), not the lexicographic fallback."""
    fasta = _chunk_df(spark, {"c1": "ACGTACGTACGT"}, 5)
    # two records at site 3: lexicographic-largest picks T, first-wins
    # picks A (rank 0); a third site is untied either way
    vdf = spark.createDataFrame(
        [("c1", 3, "G", "A", 0), ("c1", 3, "G", "T", 1),
         ("c1", 7, "G", "C", 2)],
        "contig string, start long, ref string, alt string, rank long",
    )

    def seq_of(**kw):
        rows = sorted(
            fasta_consensus(fasta, vdf, on_indel=on_indel, **kw).collect(),
            key=lambda r: r["pos"],
        )
        return "".join(r["seq"] for r in rows)

    assert seq_of() == "ACTTACCTACGT"                  # fallback: max alt
    assert seq_of(order_col="rank") == "ACATACCTACGT"  # first record wins
