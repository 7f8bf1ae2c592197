"""Similarity search over the ``embeddings`` table (E-3).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, one narrow projection computes cosine,
  ``row_number`` over (query) picks k. At 100 TB the corpus side never
  shuffles — the only exchange is the final per-query top-k, which
  Catalyst executes as partial top-k per partition (WindowGroupLimit
  pushdown) before the tiny shuffle.
* ``sign_lsh_topk`` — the scale path: deterministic sign-bit buckets
  (hyperplanes = coordinate axes of the first ``n_bits`` dims), search
  only the query's bucket. Recall trades off with n_bits; both sides
  (Spark + DuckDB oracle) can compute the bucket exactly, so this is
  fully oracle-checkable, unlike random-hyperplane LSH.
* ``embedding_near_dup_pairs`` — cosine near-dup pairs within sign
  buckets (E-2d embedding-cosine near-dup).

Cosines are rounded to 6dp before ranking/thresholding so Spark and
DuckDB double arithmetic agree; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from decision_tree_stuff_spark.functions.array_math import cosine_similarity


def _sign_bucket(vec, n_bits: int):
    """Bucket id from the signs of the first n_bits coordinates.

    DuckDB twin: ``sum over i of CASE WHEN embedding[i+1] >= 0 THEN
    2^i ELSE 0 END`` (1-based list index).
    """
    return sum(
        F.when(vec.getItem(i) >= 0.0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors (self excluded) for each query id.

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k by
    (cosine desc, neighbor_id asc).
    """
    from decision_tree_stuff_spark.operators import spread_small

    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    # the |queries| dot products per row dominate; spread a
    # single-split bench input first (guarded no-op at scale)
    scored = (
        spread_small(embeddings).crossJoin(F.broadcast(queries))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("query_vec"), F.col(vec_col)), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sign_lsh_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket. Same output shape as ``cosine_topk``; recall < 1 by
    design. The bucket equi-join replaces the cross join — candidate
    count drops ~2^n_bits-fold on isotropic data."""
    with_bucket = embeddings.withColumn(
        "bucket", _sign_bucket(F.col(vec_col), n_bits)
    )
    queries = with_bucket.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.col("bucket"),
    )
    scored = (
        with_bucket.join(F.broadcast(queries), "bucket")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("query_vec"), F.col(vec_col)), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 42):
    """Seeded deterministic Gaussian hyperplanes for random-projection
    LSH, as plain Python lists — the same literals are embedded in the
    Spark plan AND the DuckDB oracle SQL, so the two engines bucket
    identically. numpy's RandomState(seed) is stable across platforms
    and versions by spec (Mersenne Twister + documented
    standard_normal stream)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    return [[float(v) for v in row] for row in rs.standard_normal((n_planes, dim))]


RP_DIM, RP_SEED = 16, 7


def project_embeddings(
    embeddings: DataFrame,
    out_dim: int = RP_DIM,
    in_dim: int = 64,
    seed: int = RP_SEED,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: ``y_j = (x · r_j) /
    sqrt(out_dim)`` with seeded Gaussian rows ``r_j`` (the same
    ``hyperplanes`` literals the LSH oracles share), as ONE
    shuffle-free projection — no UDF, no collect, no exchange.

    The 100 TB story: project once at ingest and every downstream
    distance computation (brute-force top-k, SemDeDup, IVF training)
    pays ``out_dim/in_dim`` of the FLOPs and the materialized column
    ``out_dim/in_dim`` of the bytes, while JL bounds the pairwise
    distance distortion (Dasgupta & Gupta 2003: eps ~ sqrt(8 ln n /
    out_dim)). Deterministic given the seed, so the DuckDB twin
    reproduces every coordinate bit-for-bit with the shared
    ``list_sum(list_transform(list_zip(...)))`` fold."""
    planes = hyperplanes(out_dim, in_dim, seed)
    scale = 1.0 / (out_dim ** 0.5)
    proj = F.array(
        *[
            (_dot_literal(F.col(vec_col), row) * F.lit(scale)).alias(
                f"p{j}"
            )
            for j, row in enumerate(planes)
        ]
    )
    return embeddings.withColumn(out_col or vec_col, proj)


def rp_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 5,
    out_dim: int = RP_DIM,
    in_dim: int = 64,
    seed: int = RP_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k in the JL-projected space — exact
    ``cosine_topk`` mechanics over ``out_dim``-d vectors. Approximate
    w.r.t. the original space (recall floor pinned in tests), at
    ``out_dim/in_dim`` of the scoring cost."""
    projected = project_embeddings(
        embeddings, out_dim, in_dim, seed, vec_col
    )
    return cosine_topk(projected, query_ids, k, id_col, vec_col)


def _dot_literal(vec, plane):
    """vec · literal-plane, JVM-side (zip_with + aggregate — no UDF)."""
    lit = F.array(*[F.lit(v) for v in plane])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _hyperplane_bucket(vec, planes):
    """Bucket id = sign bits of the vec·plane projections."""
    return sum(
        F.when(_dot_literal(vec, h) >= 0.0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, h in enumerate(planes)
    )


def rh_lsh_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via random-hyperplane (SimHash) LSH buckets.

    Same bucket-equi-join shape (and 100 TB story) as
    ``sign_lsh_topk`` — corpus never shuffles, queries broadcast — but
    the bucket comes from the signs of ``n_planes`` seeded Gaussian
    projections instead of the first coordinates' signs.
    Coordinate-sign buckets degrade when embeddings are anisotropic
    (uninformative or off-center leading coordinates randomize or
    collapse the bucket); random hyperplanes mix ALL dimensions, so
    P[same bucket] = (1 - theta/pi)^n_planes holds for any embedding
    geometry (Charikar STOC'02). Deterministic: the plane set is a
    pure function of (seed, n_planes, dim).

    ``multiprobe``: also probe the ``n_planes`` buckets at Hamming
    distance 1 from the query's (Lv et al. VLDB'07) — the QUERY side
    explodes 1+n_planes-fold (still a broadcast equi-join; the corpus
    side is untouched), trading candidate volume for recall without
    re-bucketing. A (query, neighbor) pair still joins at most once:
    the neighbor has one bucket and the probe list is distinct.
    """
    planes = hyperplanes(n_planes, dim, seed)
    with_bucket = embeddings.withColumn(
        "bucket", _hyperplane_bucket(F.col(vec_col), planes)
    )
    queries = with_bucket.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.col("bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        queries = queries.select(
            "query_id", "query_vec", F.explode(probes).alias("bucket")
        )
    scored = (
        with_bucket.join(F.broadcast(queries), "bucket")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("query_vec"), F.col(vec_col)), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q_i = round(v_i / scale) — 4× (fp32) to 8× (fp64) smaller storage
    for ANN candidate generation, the standard first compression step
    for a 100 TB embedding store.

    All JVM-side array lambdas (transform/aggregate) — no UDF.
    Rounding is written as ``floor(x + 0.5)`` (round-half-up toward
    +inf for both signs) explicitly because engines disagree on
    banker's rounding; DuckDB's ``floor`` reproduces it bit-for-bit,
    which makes the op value-oracle-able. Zero vectors get scale 0 and
    an all-zero code (guarded division).

    Returns (id_col, scale, qvec array<int>).
    """
    vec = F.col(vec_col)
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).alias("scale")
    q = F.when(amax == 0.0, F.transform(vec, lambda x: F.lit(0))).otherwise(
        F.transform(
            vec,
            lambda x: F.floor(x / (amax / F.lit(127.0)) + F.lit(0.5)).cast(
                "int"
            ),
        )
    )
    return embeddings.select(F.col(id_col), scale, q.alias("qvec"))


def dequantize_embeddings(
    quantized: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: v_i ≈ q_i * scale. Returns
    (id_col, embedding array<double>)."""
    return quantized.select(
        F.col(id_col),
        F.transform(
            F.col("qvec"), lambda x: x.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 65536,
    iters: int = 10,
):
    """Deterministic sampled Lloyd k-means for the IVF quantizer.

    The standard IVF training path at scale: training touches only a
    bounded sample (top-``sample_size`` by id — a partial top-k scan,
    not a full sort), runs driver-side numpy, and the full corpus only
    ever sees the resulting broadcast centroid table. Determinism:
    fixed init (first ``n_centroids`` sample vectors), fixed iteration
    count, argmax ties to the lowest centroid index.

    Returns ``[(cid, [float, ...]), ...]`` ready for
    ``spark.createDataFrame(..., 'cid int, cvec array<double>')``.
    """
    import numpy as np

    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    if len(rows) < n_centroids:
        raise ValueError(
            f"train_ivf_centroids: sample has {len(rows)} vectors but "
            f"n_centroids={n_centroids} — reduce n_centroids or provide "
            "more data (init takes the first n_centroids sample vectors)"
        )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_centroids].copy()
    for _ in range(iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for j in range(n_centroids):
            members = assign == j
            if members.any():
                C[j] = X[members].mean(axis=0)
    return [(j, [float(v) for v in C[j]]) for j in range(n_centroids)]


def _l2_literal(vec, centroid, round_dp: int = 6):
    """Rounded squared L2 between a vector column and a LITERAL
    centroid — same zip_with/aggregate fold (and 6 dp pre-argmin
    rounding) as ``_sub_l2``, so the DuckDB ``_l2_sql`` twin is
    bit-identical."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(
                vec.cast("array<double>"), lit, lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_dp,
    )


def _kmeans_best(vec, centroids):
    """struct(dist, cid) of the nearest centroid: array_min over
    literal-centroid distance structs — lexicographic struct ordering
    gives min dist with ties to the lowest cid, all in one shuffle-free
    projection."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _l2_literal(vec, c).alias("dist"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    cache: bool = True,
):
    """FULLY DISTRIBUTED Lloyd k-means — the full-corpus complement to
    ``train_ivf_centroids``' driver-side sampled trainer (use this one
    when the clustering itself is the product, e.g. SemDeDup cluster
    maps over the whole corpus).

    Per iteration the corpus is scanned once: assignment is a
    shuffle-free literal-centroid projection (``_kmeans_best``), the
    update a single map-side-combinable groupBy whose shuffle carries
    k×d partial sums per partition — the PLANET/MLlib shape that holds
    at 100 TB (cost = iters scans, never a corpus-sized shuffle). Only
    the k centroid rows ever reach the driver.

    Determinism contract (what makes a float-iterative algorithm
    engine-portable): init = the k lowest-id vectors; every centroid
    coordinate and every distance is rounded to ``round_dp`` before
    use, so partial-sum ulp noise cannot flip an assignment; argmin
    ties go to the lowest cid; empty clusters keep their previous
    centroid. The DuckDB twin unrolls the same iterations as CTEs and
    matches exactly.

    ``cache=True`` persists the projected (id, double-vector) frame
    for the duration of the fit (MEMORY_AND_DISK — the same contract
    MLlib's KMeans documents): without it every iteration re-scans and
    re-decodes the source parquet, multiplying the dominant 100 TB
    cost by ``iters``. Results are identical either way — the
    determinism contract is partitioning-independent by construction.

    Returns ``[(cid, [double, ...]), ...]`` (rounded coordinates).
    """
    from decision_tree_stuff_spark.operators import spread_small

    # spread a single-split input first (guarded no-op on multi-split
    # tables): the persisted frame keeps the scan's partitioning, so
    # without this every iteration's k×d distance projection AND the
    # update aggregate run on one core of the executor (r10)
    proj = spread_small(embeddings).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    if cache:
        from pyspark import StorageLevel

        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        init = (
            proj.orderBy(id_col)
            .limit(k)
            .select(F.transform("v", lambda x: F.round(x, round_dp)).alias("v"))
            .collect()
        )
        if len(init) < k:
            raise ValueError(
                f"kmeans_fit: corpus has {len(init)} vectors but k={k}"
            )
        C = [list(r["v"]) for r in init]
        d = len(C[0])
        for _ in range(iters):
            best = _kmeans_best(F.col("v"), C)
            rows = (
                proj.select(best["cid"].alias("cid"), "v")
                .groupBy("cid")
                .agg(
                    *[
                        F.round(
                            F.avg(F.element_at(F.col("v"), i + 1)), round_dp
                        ).alias(f"c{i}")
                        for i in range(d)
                    ]
                )
                .collect()
            )
            got = {r["cid"]: [r[f"c{i}"] for i in range(d)] for r in rows}
            C = [got.get(j, C[j]) for j in range(k)]
        return [(j, C[j]) for j in range(k)]
    finally:
        if cache:
            proj.unpersist()


def kmeans_assign(
    embeddings: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, dist) under literal ``centroids`` (coordinate lists,
    e.g. ``[c for _, c in kmeans_fit(...)]``) — one shuffle-free
    projection over the corpus (spread first when the input is a
    single scan split, r10)."""
    from decision_tree_stuff_spark.operators import spread_small

    best = _kmeans_best(F.col(vec_col), centroids)
    return spread_small(embeddings).select(
        F.col(id_col),
        best["cid"].alias("cid"),
        best["dist"].alias("dist"),
    )


def _quantizer_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    centroid_mode: str,
) -> DataFrame:
    """Centroid table (cid, cvec) for the coarse quantizer.

    ``'first'`` = the n_centroids lowest-id vectors (deterministic,
    training-free — the mode the DuckDB oracles reproduce);
    ``'kmeans'`` = sample-trained Lloyd (production)."""
    if centroid_mode == "kmeans":
        return embeddings.sparkSession.createDataFrame(
            train_ivf_centroids(embeddings, n_centroids, id_col, vec_col),
            "cid int, cvec array<double>",
        )
    assert centroid_mode == "first", f"unknown centroid_mode {centroid_mode!r}"
    return embeddings.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )


def _assigned_cells(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Rank every vector's centroids by rounded cosine (ties to the
    lowest cid): (id, vec, cid, ccos, rn). rn=1 is the home cell. The
    centroid table is broadcast — C×dim work per row, the corpus never
    shuffles for assignment."""
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("ccos").desc(), F.col("cid").asc()
    )
    return (
        embeddings.crossJoin(F.broadcast(centroids))
        .select(
            F.col(id_col),
            F.col(vec_col),
            "cid",
            F.round(cosine_similarity(F.col(vec_col), F.col("cvec")), 6).alias(
                "ccos"
            ),
        )
        .withColumn("rn", F.row_number().over(w_assign))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize vectors to their
    nearest centroid cell; each query searches its ``nprobe`` nearest
    cells (corpus vectors always live in exactly one cell, so probing
    more cells unions disjoint candidate sets — recall rises, cost
    grows ~linearly in nprobe).

    ``centroid_mode='first'`` (default) uses the ``n_centroids``
    lowest-id vectors — a deterministic, training-free quantizer the
    DuckDB oracle reproduces exactly. ``'kmeans'`` sample-trains the
    quantizer (``train_ivf_centroids``) for materially better cells —
    the production choice; same plan shape either way (centroids stay
    a broadcast table). Assignment = argmax rounded cosine with
    centroid-id tie-break (deterministic across engines).

    Scale: assignment is a broadcast nested-loop over C centroids —
    C×dim work per row, no shuffle of the corpus; the cell equi-join
    replaces the cross join, cutting candidates ~(C/nprobe)-fold.
    """
    centroids = _quantizer_centroids(
        embeddings, n_centroids, id_col, vec_col, centroid_mode
    )
    assigned = _assigned_cells(embeddings, centroids, id_col, vec_col)
    cells = assigned.where(F.col("rn") == 1).select(id_col, vec_col, "cid")
    queries = assigned.where(
        F.col(id_col).isin(query_ids) & (F.col("rn") <= nprobe)
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.col("cid"),
    )
    scored = (
        cells.join(F.broadcast(queries), "cid")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("query_vec"), F.col(vec_col)), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E-2d: pairs with cosine ≥ threshold, blocked by sign bucket.

    High-cosine pairs almost surely agree on leading-coordinate signs,
    so the bucket self-join finds them without a quadratic cross join.
    Returns (id_a, id_b, cosine)."""
    with_bucket = embeddings.select(
        F.col(id_col), F.col(vec_col), _sign_bucket(F.col(vec_col), n_bits).alias("bucket")
    )
    a = with_bucket.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    b = with_bucket.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("vec_a"), F.col("vec_b")), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    of an embedding corpus. Coarse-cluster with the IVF quantizer,
    then inside each cluster mark every vector whose rounded cosine to
    a LOWER-id cluster-mate is >= eps as a duplicate — exactly one
    survivor per semantic-duplicate group, deterministically the
    lowest id (the paper keeps a random/centroid-distant one; lowest
    id is the engine-portable choice).

    Plan: assignment is the broadcast-centroid argmax (corpus never
    shuffles to be assigned); the pairwise check is a cid-equi
    self-join, so comparisons happen only WITHIN cells. That is the
    paper's own cost model: per-cluster quadratic, made tractable by
    growing k with the corpus (they use k=50k for LAION) so cells stay
    O(N/k) small. At 100 TB use ``centroid_mode='kmeans'`` with a k
    sized to the corpus; the cell join then shuffles on a high-
    cardinality key with bounded groups.

    Returns (id_col, cid, keep) for every input vector — filter
    ``keep`` to materialize the deduplicated corpus.
    """
    centroids = _quantizer_centroids(
        embeddings, n_centroids, id_col, vec_col, centroid_mode
    )
    cells = (
        _assigned_cells(embeddings, centroids, id_col, vec_col)
        .where(F.col("rn") == 1)
        .select(id_col, vec_col, "cid")
    )
    a = cells.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "cid"
    )
    b = cells.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "cid"
    )
    dups = (
        a.join(b, "cid")
        .where(F.col("id_b") < F.col("id_a"))
        .where(
            F.round(
                cosine_similarity(F.col("vec_a"), F.col("vec_b")), 6
            ) >= eps
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return cells.join(dups, id_col, "left").select(
        F.col(id_col),
        F.col("cid"),
        F.col("__dup").isNull().alias("keep"),
    )


def pq_codebook(
    embeddings: DataFrame,
    m: int = 8,
    n_codewords: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "first",
    sample_size: int = 65536,
    iters: int = 10,
):
    """Product-quantization codebook: ``m`` independent sub-codebooks
    of ``n_codewords`` centroids each, over equal vector slices
    (Jégou et al. TPAMI'11 — the FAISS memory-compression workhorse).

    ``mode='first'``: codewords = the sub-slices of the
    ``n_codewords`` lowest-id vectors — deterministic and
    training-free, reproduced exactly by the DuckDB twin (the same
    trick the IVF oracles use). ``mode='kmeans'``: per-subspace Lloyd
    on a bounded id-ordered sample (driver-side numpy; fixed init,
    fixed iters) — the production codebook. Either way the result is
    a plain nested list ``[m][n_codewords][subdim]`` embedded into the
    plan as literals: training data never exceeds the bounded sample,
    and the corpus only ever meets the codebook as broadcast/literal
    values.
    """
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_codewords if mode == "first" else sample_size)
        .collect()
    )
    if len(rows) < n_codewords:
        raise ValueError(
            f"pq_codebook: need at least {n_codewords} vectors, "
            f"got {len(rows)}"
        )
    dim = len(rows[0][1])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    if mode == "first":
        return [
            [[float(v) for v in rows[c][1][j * d:(j + 1) * d]]
             for c in range(n_codewords)]
            for j in range(m)
        ]
    assert mode == "kmeans", f"unknown codebook mode {mode!r}"
    import numpy as np

    X = np.array([r[1] for r in rows], dtype=np.float64)
    book = []
    for j in range(m):
        S = X[:, j * d:(j + 1) * d]
        C = S[:n_codewords].copy()
        for _ in range(iters):
            dists = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(dists, axis=1)
            for c in range(n_codewords):
                members = assign == c
                if members.any():
                    C[c] = S[members].mean(axis=0)
        book.append([[float(v) for v in C[c]] for c in range(n_codewords)])
    return book


def _sub_l2(vec, j: int, d: int, codeword):
    """Rounded squared L2 between vector slice j and a literal
    codeword — rounding to 6dp BEFORE any argmin/sum keeps Spark and
    the DuckDB twin bit-identical."""
    lit = F.array(*[F.lit(v) for v in codeword])
    return F.round(
        F.aggregate(
            F.zip_with(
                F.slice(vec, j * d + 1, d), lit, lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_codes(
    embeddings: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to ``m`` small codes — argmin codeword per
    subspace (ties to the lowest code). ONE narrow projection, zero
    shuffles: the codebook rides in the plan as literals, so at 100 TB
    this is a single scan that shrinks a 64-float vector to m bytes —
    the entire point of PQ (RAM-resident indexes over billion-vector
    corpora). Returns (id_col, codes array<int>).
    """
    m = len(codebook)
    d = len(codebook[0][0])
    code_exprs = []
    for j in range(m):
        cands = F.array(
            *[
                F.struct(
                    _sub_l2(F.col(vec_col), j, d, cw).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c, cw in enumerate(codebook[j])
            ]
        )
        code_exprs.append(F.array_min(cands)["c"])
    return embeddings.select(
        F.col(id_col), F.array(*code_exprs).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 5,
    m: int = 8,
    n_codewords: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "first",
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance (ADC): corpus
    vectors are quantized to codes; each query's exact subspace
    distances to every codeword form a lookup table, and a vector's
    approximate distance is the sum of m table entries selected by its
    codes.

    Plan: the LUT for the (bounded, collected) query set is embedded
    as literals, so scoring is ``aggregate(sequence(0, m-1), ...)``
    over the codes array — a PURE PROJECTION per query; the only
    exchange is the final per-query top-k, which WindowGroupLimit
    prunes map-side (same shape as ``cosine_topk``). The corpus is
    scanned once, never shuffled, and never holds floats after
    encoding. At billion-vector scale this composes with IVF cells
    (search nprobe cells' codes only) — FAISS's IVF-PQ; here ADC runs
    over the full code table as the published baseline.

    Returns (query_id, neighbor_id, approx_dist, rank) — distance
    ascending (squared L2), ties to the lowest neighbor id.
    """
    codebook = pq_codebook(
        embeddings, m, n_codewords, id_col, vec_col, mode
    )
    d = len(codebook[0][0])
    codes = pq_codes(embeddings, codebook, id_col, vec_col)
    qrows = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    per_query = []
    for qid, qvec in sorted((r[0], r[1]) for r in qrows):
        # flat LUT: entry j*n_codewords + c = rounded subspace distance
        lut = [
            round(
                sum(
                    (qvec[j * d + i] - codebook[j][c][i]) ** 2
                    for i in range(d)
                ),
                6,
            )
            for j in range(m)
            for c in range(n_codewords)
        ]
        lut_lit = F.array(*[F.lit(v) for v in lut])
        dist = F.round(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    lut_lit,
                    j * n_codewords
                    + F.element_at(F.col("codes"), j + 1)
                    + 1,
                ),
            ),
            6,
        )
        per_query.append(
            F.struct(
                F.lit(qid).cast("bigint").alias("query_id"),
                dist.alias("approx_dist"),
            )
        )
    scored = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(F.array(*per_query)).alias("q"),
    ).select("q.query_id", "neighbor_id", "q.approx_dist")
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    m: int = 8,
    n_codewords: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
    codebook_mode: str = "first",
) -> DataFrame:
    """IVF-PQ: the FAISS production composition — coarse-quantize the
    corpus into IVF cells, PQ-encode every vector, and ADC-score each
    query only against the codes in its ``nprobe`` nearest cells.

    Plan: cell assignment is the broadcast-centroid argmax (shared
    with ``ivf_topk``/``semdedup``); encoding is the zero-shuffle
    literal-codebook projection (``pq_codes``); which cells each query
    probes is decided driver-side from the same collected query
    vectors the LUT needs anyway, so scoring stays ONE projection —
    per-query literal LUT + an ``array_contains`` probe-cell filter —
    followed by the WindowGroupLimit top-k. Candidate volume drops
    ~(n_centroids/nprobe)-fold exactly as in ``ivf_topk``, and the
    scored payload is m CODES per candidate, not the float vector:
    both FAISS levers, composed relationally.
    """
    centroids = _quantizer_centroids(
        embeddings, n_centroids, id_col, vec_col, centroid_mode
    )
    cells = (
        _assigned_cells(embeddings, centroids, id_col, vec_col)
        .where(F.col("rn") == 1)
        .select(id_col, "cid")
    )
    codebook = pq_codebook(
        embeddings, m, n_codewords, id_col, vec_col, codebook_mode
    )
    d = len(codebook[0][0])
    coded = pq_codes(embeddings, codebook, id_col, vec_col).join(
        cells, id_col
    )

    cent_rows = sorted((r["cid"], r["cvec"]) for r in centroids.collect())
    qrows = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return round(num / (na * nb), 6)

    per_query = []
    for qid, qvec in sorted((r[0], r[1]) for r in qrows):
        probes = [
            cid
            for cid, _ in sorted(
                ((cid, _cos(qvec, cvec)) for cid, cvec in cent_rows),
                key=lambda t: (-t[1], t[0]),
            )[:nprobe]
        ]
        lut = [
            round(
                sum(
                    (qvec[j * d + i] - codebook[j][c][i]) ** 2
                    for i in range(d)
                ),
                6,
            )
            for j in range(m)
            for c in range(n_codewords)
        ]
        lut_lit = F.array(*[F.lit(v) for v in lut])
        dist = F.round(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    lut_lit,
                    j * n_codewords
                    + F.element_at(F.col("codes"), j + 1)
                    + 1,
                ),
            ),
            6,
        )
        per_query.append(
            F.struct(
                F.lit(qid).cast("bigint").alias("query_id"),
                dist.alias("approx_dist"),
                F.array(*[F.lit(c) for c in probes]).alias("probes"),
            )
        )
    scored = (
        coded.select(
            F.col(id_col).alias("neighbor_id"),
            "cid",
            F.explode(F.array(*per_query)).alias("q"),
        )
        .where(F.array_contains(F.col("q.probes"), F.col("cid")))
        .select("q.query_id", "neighbor_id", "q.approx_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )
