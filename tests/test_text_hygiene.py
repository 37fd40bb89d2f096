"""Decontamination, repetition metrics, duplicate marking (unit semantics)."""

from pyspark.sql import functions as F


class TestBenchmarkOverlap:
    def test_flags_only_leaking_docs(self, spark):
        from hadoop_bam_spark.operators.text import benchmark_overlap

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps")], ["doc_id", "text"]
        )
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox runs home"),  # shares 3-grams
                (2, "completely different words here now"),
                (3, "QUICK BROWN FOX"),  # case-insensitive single shingle run
            ],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.n_shared
            for r in benchmark_overlap(corpus, bench, n=3).collect()
        }
        # doc 1 shares "the quick brown" and "quick brown fox"
        assert got[1] == 2
        assert 2 not in got
        # doc 3 lowercases to exactly one shared 3-gram
        assert got[3] == 1

    def test_short_docs_single_shingle(self, spark):
        from hadoop_bam_spark.operators.text import token_shingles

        df = spark.createDataFrame([("ab cd",)], ["text"])
        rows = df.select(token_shingles(F.col("text"), 3).alias("g")).collect()
        assert rows[0].g == ["ab cd"]


class TestRepetitionScores:
    def test_known_document(self, spark):
        from hadoop_bam_spark.operators.text import repetition_scores

        df = spark.createDataFrame(
            [(1, "a a a b"), (2, "x y z w")], ["doc_id", "text"]
        )
        got = {r.doc_id: r for r in repetition_scores(df).collect()}
        assert got[1].n_tokens == 4
        assert got[1].n_distinct == 2
        assert abs(got[1].dup_ratio - 0.5) < 1e-9
        assert abs(got[1].top_share - 0.75) < 1e-9
        assert got[2].dup_ratio == 0.0
        assert abs(got[2].top_share - 0.25) < 1e-9


class TestMarkDuplicates:
    def test_highest_mapq_survives(self, spark, tmp_path):
        # Build a tiny lineitem-shaped input through the reads view contract
        # is heavyweight; test the window semantics directly instead.
        from pyspark.sql import Window as W

        reads = spark.createDataFrame(
            [
                ("r1", 0, 100, 16, 30),
                ("r2", 0, 100, 16, 50),  # same site+strand, higher mapq: kept
                ("r3", 0, 100, 0, 10),  # other strand: not a duplicate
                ("r4", 1, 100, 16, 20),  # other contig
            ],
            ["qname", "ref_idx", "pos", "strand", "mapq"],
        )
        w = W.partitionBy("ref_idx", "pos", "strand").orderBy(
            F.desc("mapq"), F.asc("qname")
        )
        ranked = reads.withColumn("rk", F.row_number().over(w))
        dups = {r.qname for r in ranked.filter(F.col("rk") > 1).collect()}
        assert dups == {"r1"}
