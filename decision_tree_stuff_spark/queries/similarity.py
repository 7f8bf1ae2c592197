"""Similarity search (E-3): cosine/LSH/IVF/PQ top-k, quantization, JL projection, k-means.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    F,
    KMEANS_D,
    KMEANS_ITERS,
    KMEANS_K,
    QUERY_IDS,
    _RH_BUCKET,
    _RH_PROBES,
    _RP_PV,
    _bucket_sql,
    _cos_sql,
    _emb,
    _kmeans_cte_sql,
    _l2_sql,
    cosine_topk,
    ivf_topk,
    sign_lsh_topk,
)



def q_e3_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k (m=8 subspaces, 16 codewords
    from the vec_id<16 slices — the deterministic 'first' codebook the
    twin reproduces); scoring is a literal-LUT projection over the
    codes, no corpus shuffle."""
    from decision_tree_stuff_spark.operators.similarity import pq_topk

    return pq_topk(_emb(spark, sf_dir), QUERY_IDS, k=5, m=8, n_codewords=16)


def q_e3_ivf_pq_topk(spark, sf_dir):
    """FAISS's IVF-PQ composition: probe the 2 nearest IVF cells, ADC-
    score only their codes (both quantizers in the deterministic
    'first' mode the twin reproduces)."""
    from decision_tree_stuff_spark.operators.similarity import ivf_pq_topk

    return ivf_pq_topk(
        _emb(spark, sf_dir), QUERY_IDS, k=5, n_centroids=16, nprobe=2
    )


def q_e3_cosine_topk(spark, sf_dir):
    return cosine_topk(_emb(spark, sf_dir), QUERY_IDS, k=5)


def q_e3_sign_lsh_topk(spark, sf_dir):
    return sign_lsh_topk(_emb(spark, sf_dir), QUERY_IDS, k=5, n_bits=8)


def q_e3_quantize(spark, sf_dir):
    """int8 embedding quantization, digested to scalar columns for
    the value oracle (scale at 6 dp; the int codes as count/sum/
    min/max/md5-of-joined — exact, array-free comparison)."""
    from decision_tree_stuff_spark.operators.similarity import (
        quantize_embeddings,
    )

    q = quantize_embeddings(_emb(spark, sf_dir))
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale6"),
        F.aggregate(
            F.col("qvec"), F.lit(0), lambda a, x: a + x
        ).alias("qsum"),
        F.array_min("qvec").alias("qmin"),
        F.array_max("qvec").alias("qmax"),
        F.md5(F.concat_ws(",", F.col("qvec"))).alias("qhash"),
    )


def q_e3_rh_lsh_topk(spark, sf_dir):
    """Random-hyperplane LSH top-k: seeded Gaussian projections fix
    the coordinate-sign bucket's anisotropy collapse; same plan
    shape. 4 planes + Hamming-1 multiprobe is the measured operating
    point clearing 0.5 recall on the structureless test embeddings
    (single-probe 8-bit LSH has ~0 recall there for ANY plane family —
    expected candidate count < 1 per bucket at 500 vectors). The
    oracle embeds the identical plane literals."""
    from decision_tree_stuff_spark.operators.similarity import rh_lsh_topk

    return rh_lsh_topk(
        _emb(spark, sf_dir), QUERY_IDS, k=5, n_planes=4, dim=64, multiprobe=True
    )


def q_e3_ivf_topk(spark, sf_dir):
    return ivf_topk(_emb(spark, sf_dir), QUERY_IDS, k=5, n_centroids=16)


def q_e3_ivf_topk_nprobe2(spark, sf_dir):
    """IVF with nprobe=2 — each query searches its two nearest cells
    (higher recall, same plan shape); oracle probes rn <= 2."""
    return ivf_topk(_emb(spark, sf_dir), QUERY_IDS, k=5, n_centroids=16, nprobe=2)


def q_e3_rp_topk(spark, sf_dir):
    """Brute-force cosine top-k in the Johnson-Lindenstrauss projected
    space (r7): 64-d -> 16-d via the seeded Gaussian literals, ONE
    shuffle-free projection, then exact cosine_topk mechanics at 1/4
    of the scoring FLOPs and bytes."""
    from decision_tree_stuff_spark.operators.similarity import rp_topk

    return rp_topk(_emb(spark, sf_dir), QUERY_IDS, k=5)


def q_e3_kmeans_assign(spark, sf_dir):
    """Fully distributed Lloyd k-means (r7): per iteration, assignment
    is a shuffle-free literal-centroid projection and the update one
    map-side-combined groupBy (k x d partial sums per partition) — the
    PLANET/MLlib shape. Deterministic contract (lowest-id init, 6 dp
    rounding of every centroid coordinate and distance, argmin ties to
    the lowest cid) makes the float-iterative algorithm reproducible
    by the DuckDB twin's unrolled iteration CTEs."""
    from decision_tree_stuff_spark.operators.similarity import (
        kmeans_assign,
        kmeans_fit,
    )

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    return kmeans_assign(emb, [c for _, c in cents])

ORACLE_SQL: Dict[str, str] = {
    "e3_cosine_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM s
) t WHERE rank <= 5
""",
    "e3_quantize": """
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(x))) / 127.0 AS scale,
         CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                x -> CAST(floor(x / (list_max(list_transform(embedding, y -> abs(y))) / 127.0) + 0.5) AS INT))
         END AS qvec
  FROM embeddings
)
SELECT vec_id,
       round(CAST(scale AS DOUBLE), 6) AS scale6,
       CAST(list_sum(qvec) AS INT) AS qsum,
       CAST(list_min(qvec) AS INT) AS qmin,
       CAST(list_max(qvec) AS INT) AS qmax,
       md5(array_to_string(qvec, ',')) AS qhash
FROM q
""",
    "e3_rh_lsh_topk": f"""
WITH wb AS (
  SELECT vec_id, embedding, {_RH_BUCKET} AS bucket FROM embeddings
),
q0 AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM wb
  WHERE vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
q AS (
  SELECT query_id, qv, unnest([{_RH_PROBES}]) AS bucket FROM q0
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
  FROM q JOIN wb e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM s
) t WHERE rank <= 5
""",
    "e3_sign_lsh_topk": f"""
WITH wb AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding', 8)} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM wb
  WHERE vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
  FROM q JOIN wb e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM s
) t WHERE rank <= 5
""",
    # IVF-PQ: the e3_ivf cell assignment (rounded-cosine argmax,
    # vec_id<16 centroids) restricts which codes each query scores;
    # scoring is the e3_pq ADC (codes + rounded subspace-L2 LUT)
    "e3_ivf_pq_topk": f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16
),
asg AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round({_cos_sql('e.embedding', 'c.cvec')}, 6) DESC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
),
cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS query_id, cid FROM asg
  WHERE rn <= 2 AND vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
sub AS (
  SELECT vec_id, i AS j, embedding[(i*8+1):(i*8+8)] AS svec
  FROM (SELECT vec_id, embedding, unnest(range(0, 8)) AS i
        FROM embeddings)
),
cw AS (
  SELECT vec_id AS ccode, j, svec AS cvec FROM sub WHERE vec_id < 16
),
enc AS (
  SELECT s.vec_id, s.j, c.ccode,
         row_number() OVER (PARTITION BY s.vec_id, s.j
           ORDER BY round({_l2_sql('s.svec', 'c.cvec')}, 6) ASC,
                    c.ccode ASC) AS rn
  FROM sub s JOIN cw c ON s.j = c.j
),
codes AS (SELECT vec_id, j, ccode AS code FROM enc WHERE rn = 1),
lut AS (
  SELECT s.vec_id AS query_id, s.j, c.ccode,
         round({_l2_sql('s.svec', 'c.cvec')}, 6) AS d
  FROM sub s JOIN cw c ON s.j = c.j
  WHERE s.vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
sc AS (
  SELECT l.query_id, co.vec_id AS neighbor_id,
         round(sum(l.d), 6) AS approx_dist
  FROM codes co
  JOIN cells ce ON ce.vec_id = co.vec_id
  JOIN qprobe qp ON qp.cid = ce.cid
  JOIN lut l ON l.query_id = qp.query_id
            AND l.j = co.j AND l.ccode = co.code
  WHERE co.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, approx_dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY approx_dist ASC, neighbor_id ASC) AS INT) AS rank
  FROM sc
) t WHERE rank <= 5
""",
    # PQ-ADC: codebook j = the 8-dim slices of vec_id<16; encode =
    # argmin rounded subspace L2 (tie lowest code); approx dist = sum
    # of the query's rounded subspace distances at the vector's codes
    "e3_pq_topk": f"""
WITH sub AS (
  SELECT vec_id, i AS j, embedding[(i*8+1):(i*8+8)] AS svec
  FROM (SELECT vec_id, embedding, unnest(range(0, 8)) AS i
        FROM embeddings)
),
cw AS (
  SELECT vec_id AS cid, j, svec AS cvec FROM sub WHERE vec_id < 16
),
enc AS (
  SELECT s.vec_id, s.j, c.cid,
         row_number() OVER (PARTITION BY s.vec_id, s.j
           ORDER BY round({_l2_sql('s.svec', 'c.cvec')}, 6) ASC,
                    c.cid ASC) AS rn
  FROM sub s JOIN cw c ON s.j = c.j
),
codes AS (SELECT vec_id, j, cid AS code FROM enc WHERE rn = 1),
lut AS (
  SELECT s.vec_id AS query_id, s.j, c.cid,
         round({_l2_sql('s.svec', 'c.cvec')}, 6) AS d
  FROM sub s JOIN cw c ON s.j = c.j
  WHERE s.vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
sc AS (
  SELECT l.query_id, co.vec_id AS neighbor_id,
         round(sum(l.d), 6) AS approx_dist
  FROM codes co JOIN lut l ON l.j = co.j AND l.cid = co.code
  WHERE co.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, approx_dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      ORDER BY approx_dist ASC, neighbor_id ASC) AS INT) AS rank
  FROM sc
) t WHERE rank <= 5
""",
    "e3_ivf_topk": f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16
),
asg AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round({_cos_sql('e.embedding', 'c.cvec')}, 6) DESC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
),
cells AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, cid FROM cells
  WHERE vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
  FROM q JOIN cells e ON e.cid = q.cid AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM s
) t WHERE rank <= 5
""",
    "e3_ivf_topk_nprobe2": f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16
),
asg AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round({_cos_sql('e.embedding', 'c.cvec')}, 6) DESC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
),
cells AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, cid FROM asg
  WHERE rn <= 2 AND vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS cosine
  FROM q JOIN cells e ON e.cid = q.cid AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM s
) t WHERE rank <= 5
""",
    "e3_rp_topk": f"""
WITH p AS (
  SELECT vec_id,
    {_RP_PV} AS pv
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, pv AS qv FROM p
  WHERE vec_id IN ({', '.join(str(i) for i in QUERY_IDS)})
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.pv')}, 6) AS cosine
  FROM q CROSS JOIN p e WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM s
) t WHERE rank <= 5
""",
    # k-means twin: unrolled Lloyd iterations as CTEs (see
    # _kmeans_cte_sql) — the 6 dp rounding contract on coordinates and
    # distances makes the iterative float algorithm engine-portable.
    "e3_kmeans_assign": _kmeans_cte_sql(KMEANS_K, KMEANS_ITERS, KMEANS_D),
}
