"""Plan-shape tests for text operators: tf_idf_top_terms must tokenize the
corpus exactly once. Round 6's committed plan (PLANS.md) showed TWO Generate
nodes — the df branch got a column-pruned subplan, defeating exchange reuse,
so the whole-corpus explode ran twice (2x tokenization at 100 TB). The fix
derives df via a window over the (doc, token) aggregate; these tests pin
that shape so it can't regress."""

from tests.conftest import SF_SMOKE


def _corpus(spark):
    from hadoop_bam_spark.queries.pipeline import corpus_view

    return corpus_view(spark, SF_SMOKE)


class TestTfIdfSinglePass:
    def test_one_explode_no_join(self, spark):
        from hadoop_bam_spark.operators.text import tf_idf_top_terms

        df = tf_idf_top_terms(_corpus(spark))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one tokenize+explode of the corpus; the old groupBy+broadcast-join
        # shape showed up as a second Generate over its own parquet scan
        assert plan.count("Generate explode") == 1
        # df now comes from a window count, and the only join left is the
        # broadcast of the single-row corpus-size aggregate
        assert "Window" in plan
        assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row n_docs
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" not in plan

    def test_values_match_two_pass_formula(self, spark):
        """Window-derived df must equal the old two-aggregate df: check
        tf*ln(N/df) by hand on a corpus small enough to enumerate."""
        import math

        from hadoop_bam_spark.operators.text import tf_idf_top_terms

        rows = [
            (1, "alpha alpha beta gamma"),
            (2, "alpha beta beta beta"),
            (3, "gamma gamma delta delta"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r.doc_id, r.token): r.tfidf
            for r in tf_idf_top_terms(df, min_token_len=1).collect()
        }
        n = 3.0
        # doc 1: alpha tf=2 df=2, beta tf=1 df=2, gamma tf=1 df=2
        assert got[(1, "alpha")] == round(2 * math.log(n / 2), 6)
        # doc 2: beta tf=3 df=2
        assert got[(2, "beta")] == round(3 * math.log(n / 2), 6)
        # doc 3: delta tf=2 df=1 beats gamma tf=2 df=2
        assert got[(3, "delta")] == round(2 * math.log(n / 1), 6)
        assert got[(3, "gamma")] == round(2 * math.log(n / 2), 6)
