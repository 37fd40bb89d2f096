"""Similarity search over embedding columns (array<float>).

- ``cosine_expr``: deterministic JVM-side cosine (zip_with + ordered fold,
  double precision) — identical arithmetic is expressible in DuckDB for the
  oracle, and it stays inside codegen (no Python).
- ``knn_bruteforce``: exact top-k for a (small) query set — broadcast the
  queries, score every corpus row, rank per query. The 100 TB plan: one pass
  over the corpus, no shuffle of the corpus side, per-query heap via window
  group limit.
- ``knn_lsh``: sign-bit LSH bucketing (IVF-flavored): corpus and queries
  hash to sign-pattern buckets; only same-bucket candidates are scored.
  Trades recall for a ~2^bits candidate reduction; the bucket join is an
  equi-join so it scales out cleanly.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_expr(a: Column, b: Column) -> Column:
    """Deterministic (sequential fold) double-precision dot product."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(v: Column) -> Column:
    """Euclidean norm with the exact fold cosine_expr uses for its sides.

    Evaluate it ONCE per row/side and pass the result to
    :func:`cosine_pre`: the division ``dot / (na * nb)`` is then
    bit-identical to :func:`cosine_expr` (same ops, same order) while the
    O(d) norm fold stops being recomputed per candidate pair / per
    centroid-lambda element (Catalyst does no CSE into lambda bodies)."""
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine_expr` with both norms precomputed (``na`` for ``a``,
    ``nb`` for ``b`` — keep the argument order, the multiply is ordered)."""
    return _dot_expr(a, b) / (na * nb)


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in double precision
    with a deterministic (sequential) fold."""
    return cosine_pre(a, b, norm_expr(a), norm_expr(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast); the corpus is scanned once.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    from pyspark.sql import Window as W

    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        norm_expr(F.col(vec_col)).alias("_qnorm"),
    )
    # Corpus norm computed once per row, reused across every query; query
    # norms ride the broadcast — each pair pays one dot fold, not three.
    scored = (
        corpus.withColumn("_cnorm", norm_expr(F.col(vec_col)))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("_qid").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_pre(
                    F.col("_qvec"), F.col(vec_col),
                    F.col("_qnorm"), F.col("_cnorm"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def signbit_bucket(vec: Column, dims: Sequence[int]) -> Column:
    """LSH bucket id from the sign bits of selected dimensions.

    bucket = sum_j (vec[dims[j]] > 0) << j. Element access is 1-based to
    match SQL array semantics.
    """
    bucket = F.lit(0).cast("long")
    for j, d in enumerate(dims):
        bucket = bucket + F.when(
            F.element_at(vec, d + 1).cast("double") > 0.0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: Sequence[int] = (0, 8, 16, 24),
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's sign-bit
    bucket. Equi-join on the bucket id — shuffle-partitionable, no cross
    join. Recall depends on the hash family; this deterministic variant is
    the skeleton an IVF/random-hyperplane index plugs into."""
    from pyspark.sql import Window as W

    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    cb = corpus.withColumn("_bucket", signbit_bucket(F.col(vec_col), dims)).withColumn(
        "_cnorm", norm_expr(F.col(vec_col))
    )
    qb = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        norm_expr(F.col(vec_col)).alias("_qnorm"),
        signbit_bucket(F.col(vec_col), dims).alias("_bucket"),
    )
    scored = cb.join(F.broadcast(qb), "_bucket").select(
        F.col("_qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            cosine_pre(
                F.col("_qvec"), F.col(vec_col), F.col("_qnorm"), F.col("_cnorm")
            ),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    centroid-owned lists, score each query only against its ``n_probe``
    nearest lists.

    The default centroid set is a deterministic draw (the ``n_centroids``
    lowest-id corpus vectors) so results are reproducible and
    oracle-checkable; pass ``centroids`` (centroid_id, vec_col) — e.g. the
    output of ``kmeans_refine`` below — to index against a fitted set;
    every downstream step (assign, probe, score) is unchanged.

    Plan shape at 100 TB: the centroid table is tiny BY CONSTRUCTION
    (n_centroids rows), so it is packed into a single-row array-of-structs
    (one collect_list over n_centroids rows) and broadcast. Assignment and
    probe selection are then pure per-row expressions — array_max /
    sort_array over the broadcast array — so the corpus is NEVER shuffled
    and never blown up by a per-centroid crossJoin row multiply. The probe
    join is a broadcast equi-join on centroid_id (each query scores
    ~n_probe/n_centroids of the corpus); the only shuffle left is the
    per-query top-k window over the candidate set.
    """
    from pyspark.sql import Window as W

    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    cent_src = (
        centroids.select(
            F.col("centroid_id").alias(id_col), F.col(vec_col)
        )
        if centroids is not None
        else corpus.orderBy(F.col(id_col)).limit(n_centroids)
    )
    # Centroid norms are packed into the broadcast struct (cid unique, so
    # the sort_array order is unchanged); each row's own norm is a hoisted
    # column — the per-centroid lambda then pays ONE dot fold instead of
    # three (Catalyst does no CSE into lambda bodies).
    cent_arr_df = (
        cent_src.select(
            F.struct(
                F.col(id_col).cast("long").alias("cid"),
                F.col(vec_col).alias("cvec"),
                norm_expr(F.col(vec_col)).alias("cnorm"),
            ).alias("_c")
        )
        .agg(F.sort_array(F.collect_list("_c")).alias("_cents"))
    )

    def _centroid_scores(vec, vnorm):
        # (cosine, -cid) structs: lexicographic struct ordering gives
        # highest cosine with deterministic low-id tie-break
        return F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.round(cosine_pre(vec, c["cvec"], vnorm, c["cnorm"]), 6).alias("cos"),
                (-c["cid"]).alias("neg_id"),
            ),
        )

    assigned = (
        corpus.withColumn("_vnorm", norm_expr(F.col(vec_col)))
        .crossJoin(F.broadcast(cent_arr_df))
        .withColumn(
            "centroid_id",
            -F.array_max(
                _centroid_scores(F.col(vec_col), F.col("_vnorm"))
            )["neg_id"],
        )
        .drop("_cents")
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        norm_expr(F.col(vec_col)).alias("_qnorm"),
    )
    probes = (
        q.crossJoin(F.broadcast(cent_arr_df))
        .select(
            "_qid",
            "_qvec",
            "_qnorm",
            F.explode(
                F.slice(
                    F.sort_array(
                        _centroid_scores(F.col("_qvec"), F.col("_qnorm")),
                        asc=False,
                    ),
                    1,
                    n_probe,
                )
            ).alias("_p"),
        )
        .select(
            "_qid", "_qvec", "_qnorm", (-F.col("_p.neg_id")).alias("centroid_id")
        )
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        F.col("_qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            cosine_pre(
                F.col("_qvec"), F.col(vec_col), F.col("_qnorm"), F.col("_vnorm")
            ),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd iterations over DataFrame ops: assign each vector to its
    nearest centroid (broadcast + max_by, no corpus shuffle), then recompute
    centroids as per-dimension means (posexplode -> one groupBy per round).

    Returns (centroid_id, embedding) with the same ids. Iterative model
    fitting as plain aggregates — each round is one corpus pass; lineage is
    truncated per round so plans stay bounded.
    """
    for _ in range(iterations):
        # Pack the (tiny) centroid table into one broadcast array-of-structs
        # row; assignment is then a per-row array_max — the corpus is never
        # shuffled or row-multiplied (same shape as knn_ivf above).
        c_arr = centroids.select(
            F.struct(
                F.col("centroid_id").cast("long").alias("cid"),
                F.col(vec_col).alias("cvec"),
                norm_expr(F.col(vec_col)).alias("cnorm"),
            ).alias("_c")
        ).agg(F.sort_array(F.collect_list("_c")).alias("_cents"))
        assigned = (
            corpus.withColumn("_vnorm", norm_expr(F.col(vec_col)))
            .crossJoin(F.broadcast(c_arr))
            .select(
                F.col(id_col),
                F.col(vec_col),
                (
                    -F.array_max(
                        F.transform(
                            F.col("_cents"),
                            lambda c: F.struct(
                                F.round(
                                    cosine_pre(
                                        F.col(vec_col), c["cvec"],
                                        F.col("_vnorm"), c["cnorm"],
                                    ),
                                    6,
                                ).alias("cos"),
                                (-c["cid"]).alias("neg_id"),
                            ),
                        )
                    )["neg_id"]
                ).alias("centroid_id"),
            )
        )
        # Means are rounded to 6 decimals BEFORE the float cast: double
        # addition is order-sensitive and Spark's partial aggregation order
        # is nondeterministic, so unrounded means can differ in the last
        # ulps run-to-run (and vs. a SQL oracle). Rounding at 1e-6 absorbs
        # that while leaving the clustering geometry untouched.
        centroids = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("_d", "_x")
            )
            .groupBy("centroid_id", "_d")
            .agg(F.round(F.avg("_x"), 6).alias("_m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_d", "_m"))
                ).alias("_dm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("_dm"), lambda s: s["_m"].cast("float")).alias(
                    vec_col
                ),
            )
            .localCheckpoint()
        )
    return centroids


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, blocked to stay sub-quadratic.

    At 100 TB, ``block_col`` is an LSH bucket (see signbit_bucket); here any
    equality-blocking column works and the same plan shape holds.
    """
    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    sel = [
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm_expr(F.col(vec_col)).alias("_n"),
    ]
    if block_col:
        sel.append(F.col(block_col).alias("_blk"))
    s = df.select(*sel)
    a, b = s.alias("a"), s.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    if block_col:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    return (
        a.join(b, cond)
        .withColumn(
            "cosine",
            F.round(
                cosine_pre(
                    F.col("a._v"), F.col("b._v"), F.col("a._n"), F.col("b._n")
                ),
                6,
            ),
        )
        .filter(F.col("cosine") > threshold)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            "cosine",
        )
    )


def quantize_int8_error(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization + reconstruction error.

    The ingredient of SQ/PQ-compressed ANN indexes: each vector gets a scale
    ``127 / max|x|``, components quantize by truncation toward zero (CAST in
    Spark, trunc() in DuckDB — identical semantics, unlike round(), whose
    half-way rule differs across engines). Reported per group: vector count,
    mean squared reconstruction error, worst absolute component error.

    Everything is array expressions inside one aggregation pass — at 100 TB
    this is a single corpus scan with a (group-cardinality)-sized shuffle.
    """
    x = F.col(vec_col)
    absmax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = F.lit(127.0) / F.greatest(absmax, F.lit(1e-30))
    recon = F.transform(
        x,
        lambda v: (v.cast("double") * scale).cast("int").cast("double") / scale,
    )
    diffs = F.zip_with(x, recon, lambda a, b: a.cast("double") - b)
    sq_err = F.aggregate(
        diffs, F.lit(0.0), lambda acc, d: acc + d * d
    ) / F.size(x)
    max_err = F.array_max(F.transform(diffs, lambda d: F.abs(d)))
    per_vec = df.select(
        F.col(group_col),
        sq_err.alias("_mse"),
        max_err.alias("_maxe"),
    )
    return per_vec.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("_mse"), 9).alias("avg_mse"),
        F.round(F.max("_maxe"), 9).alias("max_abs_err"),
    )


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: Optional[int] = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[DataFrame] = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster by nearest centroid,
    then inside each cluster drop every vector whose cosine to a LOWER-id
    clustermate reaches ``threshold`` (the lowest id of each semantic
    group survives).

    Returns one row per centroid: (centroid_id, n_vectors, n_dropped,
    min_kept_id).

    Plan shape at 100 TB: centroid assignment is the knn_ivf broadcast
    pattern — the centroid set packs into ONE array-of-structs row and
    assignment is a per-row array_max, so the corpus is never shuffled for
    it. The pairwise stage is an equi-join ON centroid_id (never
    all-pairs); cluster sizes stay bounded because ``n_centroids``
    DEFAULTS to ~sqrt(N) (floor 16) from a cheap corpus count when not
    given — the within-cluster pair count then grows ~N^1.5 total /
    ~N per bucket instead of N^2. Pass an explicit ``n_centroids`` (or a
    precomputed ``centroids`` frame) to skip the count scan when the
    corpus size is already known.
    """
    import math

    from hadoop_bam_spark.operators.dedup import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    if n_centroids is None and centroids is None:
        # one cheap count scan; sqrt(N) keeps per-bucket pairs ~flat
        n_centroids = max(16, int(math.isqrt(corpus.count())))
    cent_src = (
        centroids.select(F.col("centroid_id").alias(id_col), F.col(vec_col))
        if centroids is not None
        else corpus.orderBy(F.col(id_col)).limit(n_centroids)
    )
    cent_arr_df = (
        cent_src.select(
            F.struct(
                F.col(id_col).cast("long").alias("cid"),
                F.col(vec_col).alias("cvec"),
                norm_expr(F.col(vec_col)).alias("cnorm"),
            ).alias("_c")
        )
        .agg(F.sort_array(F.collect_list("_c")).alias("_cents"))
    )
    scores = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.round(
                cosine_pre(F.col(vec_col), c["cvec"], F.col("_vnorm"), c["cnorm"]),
                6,
            ).alias("cos"),
            (-c["cid"]).alias("neg_id"),
        ),
    )
    assigned = (
        corpus.withColumn("_vnorm", norm_expr(F.col(vec_col)))
        .crossJoin(F.broadcast(cent_arr_df))
        .withColumn("centroid_id", -F.array_max(scores)["neg_id"])
        .drop("_cents")
    )
    a = assigned.select(
        "centroid_id",
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        F.col("_vnorm").alias("_na"),
    )
    b = assigned.select(
        "centroid_id",
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        F.col("_vnorm").alias("_nb"),
    )
    dropped = (
        a.join(b, "centroid_id")
        .filter(F.col("_idb") < F.col("_ida"))
        .filter(
            F.round(
                cosine_pre(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")),
                6,
            )
            >= F.lit(threshold)
        )
        .select("centroid_id", F.col("_ida").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        assigned.select("centroid_id", id_col)
        .join(dropped, ["centroid_id", id_col], "left")
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.when(F.col("_dropped"), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.min(F.when(F.col("_dropped").isNull(), F.col(id_col))).alias(
                "min_kept_id"
            ),
        )
    )


def ann_recall(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Recall@k of an approximate ANN result against the exact baseline —
    per query: how many of the true top-k the approximate index returned.

    The audit a pipeline owner runs BEFORE trusting an IVF/LSH path at
    100 TB: brute force on a query sample is affordable (one corpus
    scan), and this join costs k x |queries| rows — nothing. Both inputs
    are (query_id, neighbor_id, ..., rank) frames as produced by
    :func:`knn_bruteforce` / :func:`knn_ivf` / :func:`knn_lsh`.

    Returns (query_id, n_exact, n_hit, recall) — recall rounded to 6 so
    the arithmetic is engine-portable.
    """
    e = exact.filter(F.col(rank_col) <= k).select(
        F.col(query_id_col).alias("query_id"),
        F.col(neighbor_col).alias("neighbor_id"),
    )
    a = approx.filter(F.col(rank_col) <= k).select(
        F.col(query_id_col).alias("query_id"),
        F.col(neighbor_col).alias("neighbor_id"),
    )
    hits = (
        e.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        e.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .join(hits, "query_id", "left")
        .fillna(0, subset=["n_hit"])
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
        )
    )
