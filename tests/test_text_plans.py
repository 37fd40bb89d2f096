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


class TestTfIdfSkewSafe:
    def test_skew_safe_values_identical(self, spark):
        """skew_safe=True (persisted pairs + map-side df aggregate +
        broadcast join back) must produce the exact same rows as the
        default window shape."""
        from hadoop_bam_spark.operators.text import tf_idf_top_terms

        corpus = _corpus(spark)
        key = lambda r: (r.doc_id, r.rank)
        a = {key(r): (r.token, r.tfidf)
             for r in tf_idf_top_terms(corpus).collect()}
        b = {key(r): (r.token, r.tfidf)
             for r in tf_idf_top_terms(corpus, skew_safe=True).collect()}
        assert a == b

    def test_skew_safe_plan_shape(self, spark):
        """Both consumers read the PERSISTED pairs frame (so the explode
        materializes once, even though the plan text prints the cached
        subtree under each scan), df joins back broadcast, and no
        per-token Window remains."""
        from hadoop_bam_spark.operators.text import tf_idf_top_terms

        df = tf_idf_top_terms(_corpus(spark), skew_safe=True)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # both consumers (tf side and df side) read the persisted pairs
        # frame — the explode materializes once into the cache. (Generate
        # node counts are not asserted: the plan TEXT re-prints the cached
        # subtree under each scan, and the shared-session cache manager
        # can nest relation dumps.)
        assert plan.count("InMemoryTableScan") == 2
        assert plan.count("BroadcastHashJoin") == 1  # df join-back
        assert "SortMergeJoin" not in plan
        # the only Window left is the per-doc top-n ranking — the
        # per-token df window (the skew risk) is gone
        assert plan.count("Window [row_number()") == 1
        assert "count(1) windowspecdefinition(token" not in plan
