"""Scale-shape tests for dedup operators: the registered simhash query must
plan as an equi-join (banded blocking), never a cartesian product, and the
banded join must return exactly the all-pairs ground truth (pigeonhole
recall guarantee)."""

import pytest
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


class TestPairsBudget:
    """max_bucket budget in pairs mode: a degenerate bucket above the cap is
    star-routed (m-1 edges) instead of expanding m(m-1)/2 pairs — the last
    designed-in quadratic a 100 TB corpus (empty-doc / boilerplate bucket)
    could hit. Connectivity must be unchanged and normal buckets must keep
    the full pair contract."""

    N_DEGENERATE = 50_000

    def _adversarial(self, spark, n):
        """n identical docs (one degenerate bucket) + a few normal docs."""
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        degenerate = ids.withColumn(
            "text", F.lit("boilerplate page body " * 4)
        )
        normal_rows = [
            (1_000_000, "a genuinely unique document about penguins " * 5),
            (1_000_001, "a genuinely unique document about penguins " * 5 + "!"),
            (1_000_002, "another unrelated text entirely, about glaciers " * 5),
        ]
        normal = spark.createDataFrame(normal_rows, ["doc_id", "text"])
        return degenerate.unionByName(normal)

    def test_bounded_pairs_on_adversarial_corpus(self, spark):
        """Unbudgeted, a 50k identical-text bucket would expand
        ~1.25e9 pairs; the budget must keep the output linear."""
        from hadoop_bam_spark.operators.dedup import minhash_lsh_pairs

        n = self.N_DEGENERATE
        df = self._adversarial(spark, n)
        pairs = minhash_lsh_pairs(df, num_hashes=8, band_size=2)
        cnt = pairs.count()
        # star edges from the degenerate bucket: n-1; plus the one normal
        # near-dup pair; far below quadratic.
        assert cnt < 2 * n
        assert cnt >= n - 1
        # every degenerate member is reachable from the bucket minimum
        assert (
            pairs.filter((F.col("id_a") == 0) & (F.col("id_b") < n)).count()
            == n - 1
        )

    def test_budget_preserves_connectivity_and_small_buckets(self, spark):
        from hadoop_bam_spark.operators.cluster import connected_components
        from hadoop_bam_spark.operators.dedup import minhash_lsh_pairs

        df = self._adversarial(spark, 40)
        budgeted = minhash_lsh_pairs(
            df, num_hashes=8, band_size=2, max_bucket=10
        )
        full = minhash_lsh_pairs(
            df, num_hashes=8, band_size=2, max_bucket=None
        )
        # 40-member bucket: star under the cap=10 budget, all-pairs without.
        assert full.count() >= 40 * 39 // 2
        assert budgeted.count() < 2 * 40
        cc_b = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(budgeted).collect()
        }
        cc_f = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(full).collect()
        }
        assert cc_b == cc_f
        # normal (sub-cap) buckets keep the exact pair contract
        small = minhash_lsh_pairs(
            self._adversarial(spark, 5), num_hashes=8, band_size=2,
            max_bucket=256,
        )
        small_full = minhash_lsh_pairs(
            self._adversarial(spark, 5), num_hashes=8, band_size=2,
            max_bucket=None,
        )
        key = lambda r: (r.id_a, r.id_b)
        assert sorted(map(key, small.collect())) == sorted(
            map(key, small_full.collect())
        )

    def test_overflow_audit(self, spark):
        from hadoop_bam_spark.operators.dedup import minhash_lsh_overflow

        df = self._adversarial(spark, 10)
        rows = minhash_lsh_overflow(df, num_hashes=8, band_size=2,
                                    max_bucket=4).collect()
        # 4 bands, identical signatures -> one 10-member bucket per band
        assert len(rows) == 4
        for r in rows:
            assert r.bucket_size == 10
            assert r.pairs_emitted == 9
            assert r.pairs_suppressed == 45 - 9

    def test_budget_engagement_observable_inline(self, spark, caplog):
        """Suppression must be visible WITHOUT a second query (r7 VERDICT
        #8): the observe node counts it on the same plan, lsh_budget_stats
        reads it after the action, and the watcher logs a WARNING."""
        import logging
        import time

        from hadoop_bam_spark.operators.dedup import (
            lsh_budget_stats,
            minhash_lsh_overflow,
            minhash_lsh_pairs,
        )

        df = self._adversarial(spark, 10)
        with caplog.at_level(logging.WARNING,
                             logger="hadoop_bam_spark.operators.dedup"):
            pairs = minhash_lsh_pairs(df, num_hashes=8, band_size=2,
                                      max_bucket=4)
            pairs.count()
            stats = lsh_budget_stats(pairs)
            # the watcher thread fires as soon as the observation resolves
            for _ in range(100):
                if caplog.records:
                    break
                time.sleep(0.05)
        assert stats["oversized_buckets"] == 4  # one per band
        audit = minhash_lsh_overflow(df, num_hashes=8, band_size=2,
                                     max_bucket=4)
        want = sum(r.pairs_suppressed for r in audit.collect())
        assert stats["pairs_suppressed"] == want > 0
        assert any("budget engaged" in r.message for r in caplog.records)

    def test_no_suppression_no_warning(self, spark, caplog):
        import logging
        import time

        from hadoop_bam_spark.operators.dedup import (
            lsh_budget_stats,
            minhash_lsh_pairs,
        )

        df = self._adversarial(spark, 5)
        with caplog.at_level(logging.WARNING,
                             logger="hadoop_bam_spark.operators.dedup"):
            pairs = minhash_lsh_pairs(df, num_hashes=8, band_size=2,
                                      max_bucket=256)
            pairs.count()
            stats = lsh_budget_stats(pairs)
            time.sleep(0.3)  # give a (wrong) warning a chance to land
        assert stats == {"oversized_buckets": 0, "pairs_suppressed": 0}
        assert not [r for r in caplog.records if "budget engaged" in r.message]
        # frames without a budget observation return None
        star = minhash_lsh_pairs(df, num_hashes=8, band_size=2, mode="star")
        assert lsh_budget_stats(star) is None


class TestExactSubstringSinglePass:
    def test_legacy_window_one_explode_in_plan(self, spark):
        """skew_safe=False (legacy): the gram stage executes once as a
        window count over the fingerprint — no materialization, but a
        boilerplate gram serializes into one task (kept as the escape
        hatch for corpora known free of shared substrings)."""
        from hadoop_bam_spark.operators.dedup import exact_substring_duplication

        df = exact_substring_duplication(_corpus(spark), skew_safe=False)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate explode") == 1
        assert "Window" in plan
        assert "Join" not in plan

    def test_skew_safe_default_plan(self, spark):
        """Default (r9): persisted grams + groupBy count + shuffle join
        back — map-side partials and AQE skew-join instead of a per-gram
        window task; the persist keeps the explode single-execution."""
        from hadoop_bam_spark.operators.dedup import exact_substring_duplication

        df = exact_substring_duplication(_corpus(spark))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # both consumers read the persisted grams frame
        assert plan.count("InMemoryTableScan") == 2
        # per-gram df window (the skew risk) is gone; join carries counts
        assert "windowspecdefinition(_g" not in plan
        assert "Join" in plan

    @pytest.mark.parametrize("skew_safe", [False, True])
    def test_values(self, spark, skew_safe):
        from hadoop_bam_spark.operators.dedup import exact_substring_duplication

        rows = [
            (1, "x" * 100),          # all grams self-duplicated via doc 2
            (2, "x" * 100),
            (3, "".join(chr(97 + (i * 7) % 26) + str(i) for i in range(60))),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r.doc_id: r
            for r in exact_substring_duplication(
                df, skew_safe=skew_safe
            ).collect()
        }
        assert got[1].dup_ratio == 1.0 and got[2].dup_ratio == 1.0
        assert got[3].n_dup_grams == 0

    def test_cache_handle_survives_transformations(self, spark):
        """Explicit CacheHandle API: unpersisting the internal grams
        frame stays possible after the result is transformed (the
        legacy ``._grams_cache`` attribute does not survive a
        ``.filter()``)."""
        from hadoop_bam_spark.operators.caching import CacheHandle
        from hadoop_bam_spark.operators.dedup import exact_substring_duplication

        rows = [(1, "x" * 100), (2, "x" * 100)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        with CacheHandle() as caches:
            out = exact_substring_duplication(df, cache=caches)
            dup_only = out.filter("dup_ratio > 0.5")
            assert not hasattr(dup_only, "_grams_cache")
            assert dup_only.count() == 2
            (grams,) = caches._frames
            assert grams.storageLevel.useMemory
        assert not grams.storageLevel.useMemory


class TestBudgetSinglePass:
    def test_signature_stage_once_in_plan(self, spark):
        """The pairs-mode budget must be ONE conditional expansion over one
        scan of the bucket frame — filter(small) UNION filter(big) made
        Catalyst run the whole minhash signature stage twice (measured 2x
        at sf10, SCALE.md r6)."""
        from hadoop_bam_spark.operators.dedup import minhash_lsh_pairs

        df = minhash_lsh_pairs(_corpus(spark), num_hashes=8, band_size=2,
                               max_bucket=16)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one shingle-position explode + one band explode + one pair-array
        # explode; a doubled signature stage shows up as >3 explodes
        assert plan.count("Generate explode") == 3
        # the pair-array explode is the conditional budget expansion (the
        # r8 observe node adds CASE WHENs of its own inside CollectMetrics,
        # so anchor on the explode itself)
        assert plan.count("explode(CASE WHEN (size(ids") == 1


class TestIncrementalIngest:
    def test_detects_dupes_linearly(self, spark):
        """Incoming near-dupes of corpus docs are flagged with a witness;
        a degenerate identical-text incoming batch emits LINEAR edges."""
        from hadoop_bam_spark.operators.dedup import minhash_lsh_incremental

        corpus = spark.createDataFrame(
            [
                (1, "a perfectly ordinary document about glaciers " * 5),
                (2, "an unrelated text describing penguin colonies " * 5),
                (3, "boilerplate page body " * 4),
            ],
            ["doc_id", "text"],
        )
        n_degen = 5000
        new_rows = [
            # near-dup of corpus doc 1
            (100, "a perfectly ordinary document about glaciers " * 5 + "!"),
            # genuinely novel
            (101, "completely novel content about deep sea vents " * 5),
        ] + [
            # degenerate: identical to corpus doc 3 AND to each other
            (200 + i, "boilerplate page body " * 4) for i in range(n_degen)
        ]
        new = spark.createDataFrame(new_rows, ["doc_id", "text"])
        got = minhash_lsh_incremental(
            new, corpus, num_hashes=8, band_size=2
        )
        rows = got.collect()
        flagged = {r.new_id for r in rows}
        assert 100 in flagged            # near-dup detected
        assert 101 not in flagged        # novel doc stays clean
        assert all(200 + i in flagged for i in range(0, n_degen, 997))
        # linear: one witness edge per flagged doc per colliding bucket,
        # deduped -> far below the quadratic m(m-1)/2 of the degenerate
        # bucket
        assert len(rows) < 2 * (n_degen + 2)
        # every degenerate member's witness is the bucket minimum (the
        # corpus doc 3), so routing/clustering can anchor on it
        w3 = {r.dup_of for r in rows if r.new_id >= 200}
        assert w3 == {3}

    def test_self_id_guard(self, spark):
        """An id present in both frames must not pair with itself."""
        from hadoop_bam_spark.operators.dedup import minhash_lsh_incremental

        txt = "the same document appearing on both sides " * 4
        corpus = spark.createDataFrame([(7, txt)], ["doc_id", "text"])
        new = spark.createDataFrame([(7, txt)], ["doc_id", "text"])
        rows = minhash_lsh_incremental(
            new, corpus, num_hashes=8, band_size=2
        ).collect()
        assert all(r.new_id != r.dup_of for r in rows)
