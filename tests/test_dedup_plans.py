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
