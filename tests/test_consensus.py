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
