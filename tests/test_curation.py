"""Curation operators (operators/curation.py): Gopher repetition ratios,
PII scan/redact, paragraph dedup — value checks on enumerable corpora and
plan-shape pins (map-only where promised, aggregate not window for the
corpus-level dedup)."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(SF_SMOKE + "/documents.parquet")


class TestRepetitionRatios:
    def test_values(self, spark):
        from hadoop_bam_spark.operators.curation import repetition_ratios

        rows = [
            # 4 lines, 2 distinct ("spam spam" twice, "x" twice):
            # dup_line_ratio = 2/4; chars: total 9+1+9+1=20, distinct 10
            (1, "spam spam\nx\nspam spam\nx"),
            # all-unique doc
            (2, "alpha beta\ngamma delta"),
            # one word dominating: 5x "buy" of 6 words
            (3, "buy buy buy buy buy now"),
            (4, ""),  # empty: all ratios 0, no division error
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r.doc_id: r for r in repetition_ratios(df).collect()}
        assert got[1].n_lines == 4
        assert got[1].dup_line_ratio == 0.5
        assert got[1].dup_line_char_ratio == 0.5  # 20 -> 10 chars
        assert got[2].dup_line_ratio == 0.0
        assert got[2].dup_word_ratio == 0.0
        assert abs(got[3].top_word_ratio - 5 / 6) < 1e-6
        assert abs(got[3].dup_word_ratio - 4 / 6) < 1e-6
        assert got[4].n_lines == 0 and got[4].top_word_ratio == 0.0

    def test_map_only_plan(self, spark):
        from hadoop_bam_spark.operators.curation import repetition_ratios

        plan = (
            repetition_ratios(_docs(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "Generate" not in plan  # array exprs, no explode


class TestPii:
    ROWS = [
        (1, "mail me at a.b+c@example.org or call +1 (415) 555-0199."),
        (2, "server 10.0.0.1 and 192.168.1.255 up; ssn 123-45-6789"),
        (3, "no pii here, just text with numbers 42 and 7"),
    ]

    def test_scan_counts(self, spark):
        from hadoop_bam_spark.operators.curation import pii_scan

        df = spark.createDataFrame(self.ROWS, ["doc_id", "text"])
        got = {r.doc_id: r for r in pii_scan(df).collect()}
        assert got[1].n_email == 1 and got[1].n_phone == 1
        assert got[2].n_ipv4 == 2 and got[2].n_ssn == 1
        assert got[3].n_pii == 0
        assert got[1].n_pii == got[1].n_email + got[1].n_phone + \
            got[1].n_ipv4 + got[1].n_ssn

    def test_redact(self, spark):
        from hadoop_bam_spark.operators.curation import pii_redact

        df = spark.createDataFrame(self.ROWS, ["doc_id", "text"])
        got = {r.doc_id: r for r in pii_redact(df).collect()}
        assert "@" not in got[1].text and "[PII]" in got[1].text
        assert got[2].text.count("[PII]") == 3  # 2 ips + 1 ssn
        assert got[2].n_redacted == 3
        assert got[3].text == self.ROWS[2][1] and got[3].n_redacted == 0

    def test_map_only_plan(self, spark):
        from hadoop_bam_spark.operators.curation import pii_scan

        plan = (
            pii_scan(_docs(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestParagraphDedup:
    def test_first_occurrence_wins(self, spark):
        from hadoop_bam_spark.operators.curation import paragraph_dedup

        boiler = "subscribe to our newsletter for more great content"
        rows = [
            (1, f"unique first paragraph of doc one\n\n{boiler}"),
            (2, f"{boiler}\n\nanother unique paragraph here ok"),
            (3, f"short\n\n{boiler}"),  # 'short' under min_chars: excluded
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r.doc_id, r.para_idx): r.keep
            for r in paragraph_dedup(df).collect()
        }
        # boilerplate: first occurrence is (1, 1); others dropped
        assert got[(1, 1)] is True
        assert got[(2, 0)] is False
        assert got[(3, 1)] is False
        # unique paragraphs all kept
        assert got[(1, 0)] is True and got[(2, 1)] is True
        assert (3, 0) not in got  # below min_chars

    def test_whitespace_normalized_match(self, spark):
        from hadoop_bam_spark.operators.curation import paragraph_dedup

        rows = [
            (1, "the  same   paragraph with spacing differences"),
            (2, "the same paragraph\nwith spacing differences"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r.doc_id: r.keep for r in paragraph_dedup(df).collect()}
        assert got[1] is True and got[2] is False

    def test_aggregate_not_window(self, spark):
        """Corpus-level first-occurrence must be a min_by aggregate
        (map-side partials, AQE-splittable), never a per-hash window."""
        from hadoop_bam_spark.operators.curation import paragraph_dedup

        plan = (
            paragraph_dedup(_docs(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "windowspecdefinition" not in plan
