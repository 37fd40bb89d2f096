"""Scale-shape tests for dedup operators: the registered simhash query must
plan as an equi-join (banded blocking), never a cartesian product, and the
banded join must return exactly the all-pairs ground truth (pigeonhole
recall guarantee)."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _corpus(spark):
    from hadoop_bam_spark.queries.pipeline import corpus_view

    return corpus_view(spark, SF_SMOKE)


class TestSimhashBanded:
    def test_no_cartesian_in_plan(self, spark):
        from hadoop_bam_spark.operators import dedup

        df = dedup.simhash_pairs(_corpus(spark), bits=32, max_hamming=3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_banded_equals_allpairs(self, spark):
        from hadoop_bam_spark.operators import dedup

        corpus = _corpus(spark)
        banded = dedup.simhash_pairs(corpus, bits=32, max_hamming=3)
        naive = dedup.simhash_pairs(
            corpus, bits=32, max_hamming=3, band_join=False
        )
        key = lambda r: (r.id_a, r.id_b, r.hamming)
        assert sorted(map(key, banded.collect())) == sorted(
            map(key, naive.collect())
        )

    def test_band_covers_all_bits(self, spark):
        """Bands must partition all 32 bits (last band absorbs remainder):
        a pair differing only in the top remainder bits must still be found."""
        from hadoop_bam_spark.operators import dedup

        # max_hamming=4 -> 5 bands of width 6, last band bits 24..31.
        corpus = _corpus(spark)
        banded = dedup.simhash_pairs(corpus, bits=32, max_hamming=4)
        naive = dedup.simhash_pairs(
            corpus, bits=32, max_hamming=4, band_join=False
        )
        assert banded.count() == naive.count()


class TestStarMode:
    """mode='star' must be connectivity-equivalent to mode='pairs' and
    linear in degenerate-bucket size (the sf3 cliff: empty/boilerplate
    docs share one minhash signature, so all-pairs goes quadratic)."""

    def test_components_equal_and_edges_linear(self, spark):
        from pyspark.sql import functions as F

        from hadoop_bam_spark.operators.cluster import connected_components
        from hadoop_bam_spark.operators.dedup import minhash_lsh_pairs

        rows = []
        # 60 identical empty-ish docs -> one degenerate bucket
        for i in range(60):
            rows.append((i, ""))
        # a near-dup pair cluster and some distinct docs
        base = "the quick brown fox jumps over the lazy dog " * 8
        rows.append((100, base))
        rows.append((101, base + "tail"))
        for i in range(200, 215):
            rows.append((i, f"unique document number {i} " * 10))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = minhash_lsh_pairs(df, num_hashes=8, band_size=2)
        star = minhash_lsh_pairs(df, num_hashes=8, band_size=2, mode="star")
        n_pairs, n_star = pairs.count(), star.count()
        # degenerate bucket: C(60,2)=1770 pairs vs 59 star edges
        assert n_pairs >= 1770
        assert n_star < 200
        cc_pairs = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(pairs).collect()
        }
        cc_star = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(star).collect()
        }
        assert cc_pairs == cc_star
