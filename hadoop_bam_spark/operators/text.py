"""Text-analysis operators for training-data pipelines.

All pure column expressions (codegen, no UDFs): language-ID by stopword
n-gram scoring, quality scoring (length/punct/stopword ratios), token
counting (whitespace + BPE-ish sub-token regex), and a rolling-hash document
fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword inventories per language. Real pipelines load
# frequency tables; the operator shape (score per lang → argmax) is identical.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "le", "shi", "zai", "he"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def subtoken_count(text: Column) -> Column:
    """BPE-ish sub-token count: alphanumeric runs each count as one token
    (a cheap, deterministic proxy for a real tokenizer; regex kept RE2-safe
    so the same expression runs on any engine)."""
    return F.size(
        F.filter(F.split(text, r"[^A-Za-z0-9]+"), lambda t: t != "")
    ).cast("long")


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``words`` (exact match, lowercase)."""
    toks = tokens(F.lower(text))
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def lang_scores(text: Column) -> list[Column]:
    return [
        stopword_hits(text, ws).alias(f"score_{lang}")
        for lang, ws in LANG_STOPWORDS.items()
    ]


def lang_id(text: Column) -> Column:
    """Predicted language = argmax stopword score; ties go to the
    alphabetically-first language; 'und' when nothing matches."""
    scores = [(lang, stopword_hits(text, ws)) for lang, ws in LANG_STOPWORDS.items()]
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang, score in sorted(scores, key=lambda kv: kv[0]):
        better = score > best_score  # strict: alphabetically-first wins ties
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, score).otherwise(best_score)
    return best


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: rewards mid-length docs, low punctuation,
    reasonable mean token length. Deterministic; rounded by callers."""
    n_tok = token_count(text)
    mean_tok_len = F.when(n_tok > 0, F.length(text) / n_tok).otherwise(0.0)
    len_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    tok_term = F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 1.0).otherwise(0.5)
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return (len_term * 0.4 + tok_term * 0.3 + punct_term * 0.3).cast("double")


def token_heavy_hitters(
    df, text_col: str = "text", k: int = 50, min_len: int = 1
):
    """Top-k tokens across the corpus by exact count.

    Explode -> one hash-partitioned count (map-side partial agg collapses
    each partition's counts before the shuffle, so the shuffle volume is
    bounded by distinct-tokens-per-partition, not corpus size) -> global
    top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps, no
    full sort). Ties break on the token string so results are deterministic.
    For a sketch-bounded variant at extreme cardinality, pre-filter with a
    first-pass ``hash_sample`` and re-count survivors exactly.
    """
    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    toks = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).filter(F.length("token") >= min_len)
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def tf_idf_top_terms(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_terms: int = 3,
    min_token_len: int = 4,
    skew_safe: bool = True,
    vocab_join: str = "auto",
    cache=None,
):
    """Top TF-IDF terms per document.

    Default (``skew_safe=True``) shape: ONE explode into a PERSISTED
    per-(doc, token) tf aggregate -> token document frequencies as a plain
    ``groupBy("token").count()`` over the persisted frame (map-side
    partials, AQE skew handling, no single-task token key) -> join-back
    (see ``vocab_join``) -> per-doc window top-n.

    ``vocab_join`` controls the df join-back strategy. The vocabulary is
    corpus-derived — a web-scale corpus has 100M+ distinct tokens, far
    past Spark's 8 GB broadcast / driver-memory limits — so forcing a
    broadcast hint is a scale hazard (r9 ADVICE). ``"auto"`` (default)
    plans a plain equi-join and lets AQE convert it to broadcast at
    runtime from the ACTUAL post-aggregate size (doc_freq sits behind a
    shuffle stage, so AQE has exact stats; small vocab -> runtime
    broadcast, huge vocab -> shuffle join that completes). ``"broadcast"``
    forces the hint (caller knows the vocabulary is bounded — saves the
    pairs-side shuffle write AQE cannot elide); ``"shuffle"`` forbids it.

    Why persist instead of letting Catalyst share the subtree: deriving
    ``df`` from a second aggregate over the UNmaterialized pairs frame made
    Catalyst plan two non-identical subtrees (column pruning gave the df
    branch a narrower subplan), so the corpus tokenize+explode ran TWICE —
    the same double-execution class fixed in ``exact_substring_duplication``
    (dedup.py). The persist keeps the single-explode property while the
    groupBy keeps df skew-free. Plan shape is pinned by
    ``tests/test_text_plans.py``.

    ``skew_safe=False`` is the legacy shape: df as
    ``count(1) over (partition by token)`` — no persist, one fewer
    materialization, but the per-token window puts every (doc, token) row
    for one token in a single task with no map-side partial and no AQE
    skew split (AQE does not mitigate windows). A stop-word-adjacent token
    surviving ``min_token_len`` ('that', 'with') appearing in a large
    fraction of documents becomes the straggler partition at corpus scale
    (r8 VERDICT) — only use it when the token distribution is known flat.

    Cache lifetime (``skew_safe=True``): pass a
    ``operators.caching.CacheHandle`` as ``cache`` and the persisted
    pairs frame registers on it — ``handle.unpersist()`` (or exiting the
    handle's ``with`` block) after materializing frees it, regardless of
    how the result was transformed. A one-shot caller (the oracle gate,
    bench) may skip the handle and let the persist die with the session;
    a long-lived session issuing many tf-idf queries must scope each
    call, else cached (doc_id, token, tf) rows accumulate in executor
    storage. The persist uses MEMORY_AND_DISK so a vocabulary-heavy
    corpus spills instead of evicting. (Legacy: the frame is also
    attached as ``result._tfidf_pairs_cache``, but Python attributes do
    NOT survive DataFrame transformations — ``.filter()`` returns a new
    object without it; prefer the handle.)

    Scores are rounded to 6 places so the arithmetic is reproducible across
    engines.
    """
    from pyspark.sql import Window

    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    if vocab_join not in ("auto", "broadcast", "shuffle"):
        # validate up front — with skew_safe=False the value is unused,
        # and a typo ('broadast') must not be silently ignored
        raise ValueError(f"vocab_join must be auto/broadcast/shuffle,"
                         f" got {vocab_join!r}")
    df = ensure_parallelism(df)
    # Corpus size as a broadcast single-row aggregate (not a driver-side
    # count()): the whole query stays one lazy plan, no eager job. The
    # count is column-pruned to zero columns; for a bare parquet scan it is
    # satisfied from footers alone (filtered/unioned/repartitioned inputs
    # still stream rows, but never the text bytes).
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    pairs = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .filter(F.length("token") >= min_token_len)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cached_pairs = None
    if skew_safe:
        # persist so the explode runs once despite two consumers; the df
        # aggregate gets map-side partials (no per-token single task).
        # MEMORY_AND_DISK: spill, don't recompute-the-explode on eviction.
        from pyspark import StorageLevel

        cached_pairs = pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        doc_freq = pairs.groupBy("token").agg(
            F.count(F.lit(1)).alias("df")
        )
        if vocab_join == "broadcast":
            doc_freq = F.broadcast(doc_freq)
        # "auto": no hint — AQE converts to broadcast at runtime iff the
        # aggregated vocabulary is actually small (exact shuffle stats)
        with_df = pairs.join(doc_freq, "token")
    else:
        with_df = pairs.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
        )
    scored = (
        with_df
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_terms)
        .select("doc_id", "token", "tfidf", F.col("rank").cast("long").alias("rank"))
    )
    # hand the cache lifetime to the caller (see docstring): the
    # CacheHandle survives transformations of `out`; the attribute is
    # the legacy channel and does not
    if cache is not None:
        cache.register(cached_pairs)
    out._tfidf_pairs_cache = cached_pairs
    return out


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles (lowercased, space-joined strings).

    Pure array expressions — one pass, no explode until the caller wants
    rows. Documents shorter than ``n`` tokens yield their full token string
    as the single shingle.

    The token array is BOUND ONCE per row via an outer single-element
    ``transform`` whose lambda variable the inner lambdas reference (r17,
    guide §4.3-adjacent: Catalyst does not common-subexpression-eliminate
    into lambda bodies, so the pre-r17 form re-ran ``split(trim(lower(
    text)))`` for every gram position — O(tokens²) work per document; at
    bench scale decontaminate spent most of its CPU re-splitting the same
    documents)."""
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.array(tokens(F.lower(text))),
                lambda toks: F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                ),
            )
        )
    )


def benchmark_overlap(
    corpus,
    benchmark,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Decontamination: corpus documents sharing >=1 token n-gram with a
    benchmark/eval set, with the count of distinct shared n-grams.

    The standard training-data hygiene pass (flag training documents that
    leak evaluation data). Plan shape at 100 TB: the benchmark side is an
    eval suite — thousands of documents, not billions — so its distinct
    n-gram set is BROADCAST; the corpus is exploded to (doc, gram-hash)
    once and aggregated per document after the broadcast semi-join. One
    corpus-sized explode, one groupBy on doc_id; nothing quadratic. If the
    benchmark ever outgrows broadcast, drop the hint and the same plan
    becomes a shuffled equi-join on the gram hash.
    """
    from hadoop_bam_spark.operators.dedup import ensure_parallelism, hash60

    corpus = ensure_parallelism(corpus)
    bench_grams = (
        benchmark.select(
            F.explode(token_shingles(F.col(text_col), n)).alias("_gram")
        )
        .select(hash60(F.col("_gram")).alias("_gh"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(token_shingles(F.col(text_col), n)).alias("_gram"),
    ).select("doc_id", hash60(F.col("_gram")).alias("_gh"))
    return (
        corpus_grams.join(F.broadcast(bench_grams), "_gh")
        .groupBy("doc_id")
        .agg(F.count_distinct("_gh").alias("n_shared"))
    )


def repetition_scores(df, text_col: str = "text", id_col: str = "doc_id"):
    """Within-document repetition metrics (Gopher-style quality rules):

    - ``n_tokens``     total whitespace tokens
    - ``n_distinct``   distinct tokens
    - ``dup_ratio``    fraction of tokens that are repeats of an earlier one
    - ``top_share``    share taken by the single most frequent token

    One explode -> per-(doc, token) counts -> per-doc rollup; both
    aggregations hash-partition on the document key with map-side partial
    aggregation, so the shuffle volume is distinct-tokens, not corpus size.
    """
    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    per_token = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_token.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            (F.sum("c") - F.count(F.lit(1))) / F.sum("c"), 6
        ).alias("dup_ratio"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_share"),
    )


def rolling_fingerprint(text: Column, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the characters: acc = (acc*31 + code) % mod.

    A content-defined fingerprint whose arithmetic is reproducible anywhere
    (the ordered fold keeps every intermediate < 2^63).
    """
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text), F.lit(1))),
        lambda i: F.ascii(F.substring(text, i, 1)).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % mod,
    )


def normalize_text(text: Column) -> Column:
    """Canonical cleaning pass: strip ASCII control characters, collapse
    whitespace runs to single spaces, trim. Pure regexp expressions with
    identical semantics in any RE2/PCRE-class engine, so cleaned
    fingerprints are comparable across systems."""
    no_ctrl = F.regexp_replace(text, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    collapsed = F.regexp_replace(no_ctrl, r"\s+", " ")
    return F.trim(collapsed)


# --- PII scrubbing ---------------------------------------------------------

#: Patterns chosen to parse identically under Java regex (Spark) and RE2
#: (DuckDB): no backreferences, no lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class, in PII_PATTERNS order."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]


def pii_scrub(text: Column) -> Column:
    """Replace every PII match with its class placeholder (all classes,
    all occurrences). Pure Catalyst regexp_replace chain — no UDF."""
    out = text
    for pat, repl in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, repl)
    return out


# --- URL / domain filtering ------------------------------------------------

#: Java-regex / RE2 common dialect (no lookaround): scheme + non-space run.
URL_PATTERN = r"https?://[^\s]+"
#: capture the host part of a URL
DOMAIN_PATTERN = r"https?://([^/\s]+)"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in the document, in order (array<string>)."""
    return F.regexp_extract_all(text, F.lit(URL_PATTERN), F.lit(0))


def url_domains(urls: Column) -> Column:
    """URL array -> host array (lowercased)."""
    return F.transform(
        urls, lambda u: F.lower(F.regexp_extract(u, DOMAIN_PATTERN, 1))
    )


def domain_blocklist_keep(domains: Column, blocklist: tuple[str, ...]) -> Column:
    """True when no extracted domain is on the blocklist.

    The blocklist is a literal array (real deployments broadcast-join a
    blocklist table instead when it outgrows a literal; either way the
    corpus text itself is never shuffled)."""
    return ~F.arrays_overlap(
        domains, F.array(*[F.lit(d) for d in blocklist])
    )


def remove_boilerplate(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 4,
):
    """Paragraph-level boilerplate removal (the jusText-style density pass,
    reduced to engine-bridgeable heuristics): a paragraph is boilerplate
    when it has under ``min_tokens`` tokens OR zero English stopword hits
    (navigation/menu fragments and word-salad lines have no function
    words). Returns (id_col, n_para, n_boiler, clean_md5) with clean_md5
    fingerprinting the kept paragraphs newline-joined in original order.

    Plan shape at 100 TB: the explode and per-paragraph classification are
    pipeline-local column expressions (no UDF, no shuffle); the ONLY
    shuffle is the final per-document reassembly groupBy.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "para"),
    ).withColumn("para", F.trim(F.col("para")))
    paras = paras.filter(F.col("para") != "")
    n_tok = token_count(F.col("para"))
    n_stop = stopword_hits(F.col("para"), LANG_STOPWORDS["en"])
    paras = paras.withColumn(
        "boiler", (n_tok < min_tokens) | (n_stop == 0)
    )
    return (
        paras.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_para"),
            F.sum(F.when(F.col("boiler"), 1).otherwise(0))
            .cast("long")
            .alias("n_boiler"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    ~F.col("boiler"),
                                    F.struct(F.col("pos"), F.col("para")),
                                )
                            )
                        ),
                        lambda s: s["para"],
                    ),
                    "\n",
                )
            ).alias("clean_md5"),
        )
    )


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 256,
    overlap: int = 32,
):
    """Context-window chunking: split each document into ``size``-char
    chunks whose first ``overlap`` chars repeat the previous chunk's tail
    (stride = size - overlap) — the training-prep primitive that turns
    long documents into model-context-sized rows without losing
    cross-boundary spans.

    Pure Catalyst: one ``sequence`` explode of chunk indexes, one
    ``substr`` per chunk — the text column shuffles nowhere, chunk rows
    are produced in the scan stage. n_chunks =
    max(ceil((len - overlap) / stride), 1), so every character lands in
    at least one chunk and a document shorter than ``size`` yields
    exactly one (possibly short) chunk.

    Returns (doc_id, chunk_idx, chunk_text). At 100 TB this is a
    map-only operator: output partitioning follows the input scan.
    """
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    stride = size - overlap
    t = F.col(text_col)
    n_chunks = F.greatest(
        F.ceil((F.greatest(F.length(t), F.lit(1)) - overlap) / stride),
        F.lit(1),
    ).cast("long")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            t.alias("_text"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_chunks - 1)
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.col("_text")
            .substr(
                (F.col("chunk_idx") * stride + 1).cast("int"),
                F.lit(size),
            )
            .alias("chunk_text"),
        )
    )


def quality_quantile_filter(
    df,
    text_col: str = "text",
    lang_col: str = "lang",
    quantile: float = 0.5,
    id_col: str = "doc_id",
    method: str = "histogram",
):
    """Per-language quality-quantile gate: keep documents whose
    :func:`quality_score` sits strictly above the ``quantile`` cume_dist
    WITHIN their language — the standard curation step that drops the
    bottom half of each language's crawl without letting a high-resource
    language's score distribution set the bar for a low-resource one.

    cume_dist (not percent_rank) semantics so a single-document language
    keeps its only document (cume_dist = 1.0, vs percent_rank = 0.0 which
    would silently empty rare languages). Ordering by
    (quality, ``id_col``) is a total order, so the kept set is
    deterministic and engine-portable.

    ``method="histogram"`` (default, exact): the rounded score IS a
    histogram bucket (6 decimals in [0,1] -> <=1e6+1 distinct values per
    language), so the per-language drop threshold comes from a
    (lang, quality) COUNT aggregate — map-side partials, AQE-splittable —
    never from a window over the raw rows. A language owning half the
    corpus ('en' in a real crawl) costs a half-corpus SINGLE TASK under
    the window plan; under the histogram plan it costs one <=1e6-row
    cumulative sum. The threshold frame (one row per language: boundary
    quality + how many boundary ties to drop) broadcast-joins back; only
    rows AT the boundary value need a tie-break row_number, partitioned
    by (lang, quality) — skewed only if one exact score dominates a
    language (near-identical docs; dedup upstream handles that). Two corpus
    scans (histogram pass + filter pass) instead of one scan + one
    corpus-sized skewed shuffle — the right trade at 100 TB.

    ``method="window"`` is the literal one-pass cume_dist shape — fine
    when every language is small.

    Returns the kept rows with their (row-rounded) quality score.
    """
    from pyspark.sql import Window

    scored = df.filter(F.length(text_col) > 0).select(
        "*", F.round(quality_score(F.col(text_col)), 6).alias("quality")
    )
    if method == "window":
        w = Window.partitionBy(lang_col).orderBy("quality", id_col)
        return (
            scored.withColumn("_cd", F.cume_dist().over(w))
            .filter(F.col("_cd") > quantile)
            .drop("_cd")
        )
    if method != "histogram":
        raise ValueError(f"unknown method {method!r}")
    # (lang, quality) histogram -> per-language cumulative counts. The
    # window here runs over histogram rows (<=1e6+1 per language), not
    # corpus rows.
    hist = scored.groupBy(lang_col, "quality").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wl = Window.partitionBy(lang_col).orderBy("quality")
    cum = hist.withColumn("_cum", F.sum("_c").over(wl))
    totals = cum.groupBy(lang_col).agg(F.max("_cum").alias("_n"))
    # rows dropped per language: the largest rank k with k/n <= quantile
    # — judged with the SAME double division cume_dist uses, not
    # floor(n*q): float multiply can land one off at exact boundaries
    # (10 * 0.3 = 2.999... -> floor 2, while cume_dist drops rank 3; r9
    # ADVICE). floor gives the candidate, one +-1 step under the
    # cume_dist comparison pins it. Boundary = smallest quality whose
    # cumulative count exceeds the drop budget; _need = ties at the
    # boundary that still fall inside the budget (dropped smallest-id
    # first).
    qlit = F.lit(float(quantile))
    bnd = (
        cum.join(totals, lang_col)
        .withColumn(
            "_k0", F.floor(F.col("_n") * qlit).cast("long")
        )
        .withColumn(
            "_k",
            F.when((F.col("_k0") + 1) / F.col("_n") <= qlit,
                   F.col("_k0") + 1)
            .when(F.col("_k0") / F.col("_n") > qlit, F.col("_k0") - 1)
            .otherwise(F.col("_k0")),
        )
        .filter(F.col("_cum") > F.col("_k"))
        .groupBy(lang_col)
        .agg(F.min(F.struct("quality", "_cum", "_c", "_k")).alias("_s"))
        .select(
            lang_col,
            F.col("_s.quality").alias("_thr_q"),
            (F.col("_s._k") - (F.col("_s._cum") - F.col("_s._c"))).alias(
                "_need"
            ),
        )
    )
    # languages where the budget drops everything (_cum never exceeds _k,
    # e.g. quantile=1.0) vanish from bnd; the inner join drops their rows,
    # matching cume_dist > 1.0 being never true.
    cand = scored.join(F.broadcast(bnd), lang_col, "inner").filter(
        F.col("quality") >= F.col("_thr_q")
    )
    wt = Window.partitionBy(lang_col, "quality").orderBy(id_col)
    return (
        cand.withColumn("_rn", F.row_number().over(wt))
        .filter(
            (F.col("quality") > F.col("_thr_q"))
            | (F.col("_rn") > F.col("_need"))
        )
        .drop("_rn", "_thr_q", "_need")
    )
