"""Deduplication & clone graphs (E-1/E-2/E-7): exact, Jaccard/PPJoin, MinHash, SimHash, winnowing, SNM, connected components, PageRank, triangles.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    F,
    PAIR_GRAPH_SQL,
    TOKS_SQL,
    _KM_BAND_KEYS,
    _KM_HASHES,
    _KM_SIG_AGGS,
    _MH_AGREE,
    _MH_BANDS,
    _MH_BAND_KEYS,
    _MH_N,
    _MH_SIG_AGGS,
    _SH_HI,
    _SH_LO,
    _SH_VOTES,
    _bucket_sql,
    _cos_sql,
    _docs,
    _emb,
    _pair_graph,
    embedding_near_dup_pairs,
    exact_dedup,
    fingerprint,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)



# ---------------------------------------------------------------------
# Extension operators (SURVEY.md §2.5)
# ---------------------------------------------------------------------

def q_e1_exact_dedup(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    return exact_dedup(docs, ["fp"], "doc_id")


def q_e2_jaccard_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    return ngram_jaccard_pairs(
        docs, block_cols=["lang", "len_bucket"], threshold=0.8
    )


def q_e1b_incremental_dedup(spark, sf_dir):
    """Incremental exact dedup: new batch (odd doc_ids) anti-joined on
    normalized-text fingerprint against the historical corpus (even
    doc_ids) — the production mode for a growing dataset."""
    from decision_tree_stuff_spark.operators.dedup import dedup_against_corpus

    docs = _docs(spark, sf_dir)
    survivors = dedup_against_corpus(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        mode="exact",
    )
    return survivors.select("doc_id", "lang", "n_chars")


def q_e1c_incremental_minhash(spark, sf_dir):
    """Incremental NEAR-dup dedup: a new doc is dropped if any md5km
    LSH band collides with any corpus band — sub-quadratic drop
    decision, no pairwise verification needed."""
    from decision_tree_stuff_spark.operators.dedup import dedup_against_corpus

    docs = _docs(spark, sf_dir)
    survivors = dedup_against_corpus(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        mode="minhash",
        bands=8,
        hash_fn="md5km",
    )
    return survivors.select("doc_id", "lang", "n_chars")


def q_e1d_span_dedup(spark, sf_dir):
    """Sub-document dedup (C4 recipe): drop every 10-token chunk that
    occurs verbatim in >= 2 distinct documents, rebuild each doc from
    its surviving chunks in order."""
    from decision_tree_stuff_spark.operators.dedup import span_dedup

    return span_dedup(_docs(spark, sf_dir), n=10, min_docs=2)


def q_e1e_corpus_diff(spark, sf_dir):
    """Snapshot delta audit: old = ids not divisible by 7, new = ids
    not divisible by 3 with every 5th text amended — all four statuses
    (added/removed/changed/unchanged) fire."""
    from decision_tree_stuff_spark.operators.dedup import corpus_diff

    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % 7 != 0)
    new = docs.where(F.col("doc_id") % 3 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" amended"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new)


def q_e2_jaccard_capped(spark, sf_dir):
    """Jaccard near-dups with the hot-token document-frequency cap —
    the 100 TB-safe variant (tokens in > max_df docs never enter the
    self-join). Jaccard is over the capped token sets."""
    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    return ngram_jaccard_pairs(
        docs, block_cols=["lang", "len_bucket"], threshold=0.8, max_df=390
    )


def q_e7_dedup_clusters(spark, sf_dir):
    """Near-dup cluster resolution: Jaccard pairs → connected
    components (min-label propagation) → canonical keep flag. The
    oracle is a DuckDB recursive CTE computing min-reachable-id over
    the same pair set — transitive closure, so a doc two hops from the
    canonical copy still lands in its cluster."""
    from decision_tree_stuff_spark.operators.clustering import dedup_clusters

    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    pairs = ngram_jaccard_pairs(
        docs, block_cols=["lang", "len_bucket"], threshold=0.8
    )
    return dedup_clusters(docs, pairs)


def q_e7c_dedup_keep_best(spark, sf_dir):
    """Quality-aware dedup: per near-dup cluster keep the LONGEST doc
    (ties → smallest id) instead of the arbitrary min-id copy — the
    keep rule real pipelines want. Same Jaccard pair graph as e7."""
    from decision_tree_stuff_spark.operators.clustering import dedup_keep_best

    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    pairs = ngram_jaccard_pairs(
        docs, block_cols=["lang", "len_bucket"], threshold=0.8
    )
    kept = dedup_keep_best(docs, pairs, score_col="n_chars")
    return kept.select("doc_id", "lang", "n_chars")


def q_e7d_pagerank(spark, sf_dir):
    """PageRank over the near-dup pair graph (r7, E-7d): ranks the
    most central copies inside each similarity cluster — a keep-best
    signal degree alone misses. Micro-units fixed-point recipe ⇒ the
    3-iteration unrolled DuckDB twin reproduces rank_micro exactly
    (no float ever enters a sum)."""
    from decision_tree_stuff_spark.operators.graph import pagerank

    docs, pairs = _pair_graph(spark, sf_dir)
    return pagerank(docs, pairs, iterations=3)


def q_e7e_triangles(spark, sf_dir):
    """Per-apex triangle counts of the near-dup pair graph (r7,
    E-7e): clique-ness audit of dedup clusters — real near-dup
    clusters are triangle-dense, chains of borderline matches are
    not. Low→high (degree, id) edge orientation bounds wedge fan-out
    at hubs (Suri & Vassilvitskii's last-reducer fix); all-integer ⇒
    exact oracle."""
    from decision_tree_stuff_spark.operators.graph import triangle_counts

    _, pairs = _pair_graph(spark, sf_dir)
    return triangle_counts(pairs)


def q_e7f_label_prop(spark, sf_dir):
    """Synchronous label propagation over the near-dup pair graph
    (r11, E-7f): community detection one notch softer than CC — a
    weak bridge between two dense near-dup clusters does not merge
    them. All-integer argmax (most-frequent neighbor label, min-label
    ties), synchronous rounds, so the 3-iteration unrolled DuckDB
    twin reproduces every label exactly."""
    from decision_tree_stuff_spark.operators.graph import (
        label_propagation,
    )

    docs, pairs = _pair_graph(spark, sf_dir)
    return label_propagation(docs, pairs, iterations=3)


def q_e2_minhash_pairs(spark, sf_dir):
    """MinHash LSH near-dup candidates (xxhash64-based → rows-only
    check). bands=8/r=8 puts the LSH S-curve knee at j≈0.77,
    matching the 0.7 threshold."""
    return minhash_lsh_pairs(_docs(spark, sf_dir), bands=8, threshold=0.7)


def q_e2_minhash_md5_pairs(spark, sf_dir):
    """MinHash LSH with the md5 hash family — byte-identical in DuckDB,
    so the flagship LLM-dedup path gets a full value-level oracle
    (xxhash64 stays the prod default; same plan shape either way)."""
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), bands=8, threshold=0.7, hash_fn="md5"
    )


def q_e7b_minhash_dedup_keep(spark, sf_dir):
    """The composed fuzzy-dedup pipeline a pretraining-data user
    actually runs, END TO END as one gate query: MinHash LSH pairs
    (md5km double-hash family — value-oracled, one digest per token)
    → connected components → keep one canonical doc per near-dup
    cluster. Returns the deduplicated corpus (doc_id, lang, n_chars)
    — every piece is individually oracled elsewhere; this row checks
    the composition.

    r8: staged behind ``exact_collapse`` (the Dolma/RefinedWeb
    ordering — exact dedup BEFORE MinHash): byte-identical clones
    collapse to their min-id representative ahead of the band
    self-join, which otherwise pays clone-count² per bucket; the kept
    set is provably identical for min-id canonical selection (see
    ``clustering.exact_collapse``) and the oracle is unchanged."""
    from decision_tree_stuff_spark.operators.clustering import (
        dedup_keep_collapsed,
    )

    docs = _docs(spark, sf_dir)
    return dedup_keep_collapsed(
        docs,
        lambda reps: minhash_lsh_pairs(
            reps, bands=8, threshold=0.7, hash_fn="md5km"
        ),
    ).select("doc_id", "lang", "n_chars")


def q_e2_minhash_km_pairs(spark, sf_dir):
    """MinHash LSH with the md5km (Kirsch-Mitzenmacher) family: one
    md5 per token, 64 components by modular double hashing — the
    value-oracled family that is also FAST (the md5-string family
    pays 64 digests/token; this pays 1)."""
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), bands=8, threshold=0.7, hash_fn="md5km"
    )


def q_e2_simhash_dups(spark, sf_dir):
    """SimHash hamming near-dups (xxhash64-based → rows-only check)."""
    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=8)


def q_e2_simhash_md5_dups(spark, sf_dir):
    """SimHash near-dup PAIRS with the md5 bit family (r12 — the r11
    verdict's last rows-only retirement): the full pipeline —
    fingerprints, 16-bit-chunk blocking, popcount(xor) verify — is
    value-checked end to end in DuckDB. xxhash64 stays the prod
    default (``e2_simhash_dups``, property-tested)."""
    return simhash_near_dups(
        _docs(spark, sf_dir), max_hamming=8, hash_fn="md5"
    )


def q_e2_simhash_md5(spark, sf_dir):
    """SimHash fingerprints with the md5 bit family — byte-identical
    in DuckDB (nibble extraction), so the sketch math (weighted bit
    votes → sign) is value-checked end to end; xxhash64 stays the
    prod default with the same plan."""
    from decision_tree_stuff_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir), hash_fn="md5")


def q_e2_embedding_near_dups(spark, sf_dir):
    return embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=0.4, n_bits=6)


def q_e2_semdedup(spark, sf_dir):
    """SemDeDup: cluster embeddings on the deterministic 16-centroid
    quantizer, drop every vector with a lower-id cluster-mate at
    cosine >= eps. eps=0.4 is gate-scaled (the synthetic corpus's
    planted duplicates sit near 1.0 but the small-SF slices hold only
    moderate-cosine neighbors); production eps ~ 0.95."""
    from decision_tree_stuff_spark.operators.similarity import semdedup

    return semdedup(_emb(spark, sf_dir), n_centroids=16, eps=0.4)


def q_e2_snm_pairs(spark, sf_dir):
    """Sorted-neighborhood candidate pairs (r7, Hernández & Stolfo
    1995): width-4 window over the normalized-prefix sort order via
    the two-phase range-partition rank — the hard-linear-bound
    candidate generator (no hot keys possible). Twin = row_number
    over the same total order + a rank-distance join."""
    from decision_tree_stuff_spark.operators.snm import (
        sorted_neighborhood_pairs,
    )

    return sorted_neighborhood_pairs(
        _docs(spark, sf_dir), window=4, key_length=12
    )


def q_e2_winnow_pairs(spark, sf_dir):
    """MOSS/winnowing near-dup candidates (r6): pairs sharing ≥ 2
    selected k-gram fingerprints — deterministic guarantee for any
    verbatim match ≥ w+k-1 chars, the complement of probabilistic
    MinHash. max_df=50 is load-bearing on this corpus: its tiny
    template vocabulary makes one fingerprint appear in 68% of docs
    (measured Σdf² = 190M join rows at sf0.1 uncapped); near-dup
    signal lives in the rare fingerprints, the hot ones are corpus
    boilerplate — same rationale as the Jaccard hot-token cap."""
    from decision_tree_stuff_spark.operators.dedup import winnow_pairs

    return winnow_pairs(
        _docs(spark, sf_dir), k=8, w=4, min_shared=2, max_df=50
    )


def q_e1f_exact_substring(spark, sf_dir):
    """Suffix-array-style exact-substring matches (r11, Lee et al.
    2022 ExactSubstr semantics): every maximal cross-doc verbatim
    match ≥ 25 normalized chars with exact positions and length —
    sorted-anchor + diagonal gaps-and-islands merge, no suffix array.
    max_df=50 is the same boilerplate-gram cap as the winnow row
    (fixed int so the oracle is engine-stable)."""
    from decision_tree_stuff_spark.operators.dedup import (
        exact_substring_matches,
    )

    return exact_substring_matches(
        _docs(spark, sf_dir), min_len=25, max_df=50
    )


def q_e2_edit_verified(spark, sf_dir):
    """Winnowing candidates confirmed by character-level edit distance
    (r6): certifies sequence similarity, not just bag overlap."""
    from decision_tree_stuff_spark.operators.dedup import (
        edit_similarity_pairs,
        winnow_pairs,
    )

    docs = _docs(spark, sf_dir)
    # min_shared=4 prunes the candidate set before the O(n·m) DP and
    # max_chars=200 bounds each DP — the cost discipline the operator
    # documents; thresholds chosen so verified pairs still surface at
    # every SF
    cand = winnow_pairs(docs, k=8, w=4, min_shared=4, max_df=50)
    return edit_similarity_pairs(
        docs, cand, max_rel_dist=0.5, max_chars=200
    )

ORACLE_SQL: Dict[str, str] = {
    "e1_exact_dedup": """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS doc_id,
       CAST(count(*) AS BIGINT) AS dup_count
FROM documents GROUP BY 1
""",
    # r11 exact-substring: anchor md5(25-gram) at EVERY normalized
    # position, cap gram df at 50, pair cross-doc anchors per gram,
    # then gaps-and-islands per (pair, diagonal = pos_a - pos_b):
    # match_len = 25 + island size - 1 recovers each maximal run
    # exactly. unnest(range(...)) multiplies rows; range() is
    # upper-exclusive (Spark sequence inclusive -> len-25+2).
    "e1f_exact_substring": """
WITH nz AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
posns AS (
  SELECT doc_id, t,
         CAST(unnest(range(1, CAST(length(t) AS BIGINT) - 23)) AS INT) AS pos
  FROM nz WHERE length(t) >= 25
),
anch AS (
  SELECT doc_id, pos, md5(substr(t, pos, 25)) AS g FROM posns
),
ok AS (SELECT g FROM anch GROUP BY g HAVING count(*) <= 50),
kept AS (SELECT a.* FROM anch a JOIN ok USING (g)),
p AS (
  SELECT a.doc_id AS id_a, a.pos AS pos_a,
         b.doc_id AS id_b, b.pos AS pos_b
  FROM kept a JOIN kept b USING (g)
  WHERE a.doc_id < b.doc_id
),
r AS (
  SELECT id_a, id_b, pos_a - pos_b AS diag, pos_a,
         pos_a - CAST(row_number() OVER (
           PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a
         ) AS INT) AS isl
  FROM p
)
SELECT id_a, id_b,
       CAST(min(pos_a) AS INT) AS pos_a,
       CAST(min(pos_a) - diag AS INT) AS pos_b,
       CAST(25 + count(*) - 1 AS INT) AS match_len
FROM r GROUP BY id_a, id_b, diag, isl
""",
    "e2_jaccard_pairs": f"""
WITH toks AS (
  SELECT DISTINCT doc_id, lang, len_bucket, tok AS token FROM (
    SELECT doc_id, lang, n_chars // 100 AS len_bucket,
           unnest({TOKS_SQL}) AS tok
    FROM documents
  ) u WHERE tok <> ''
),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM toks a JOIN toks b
    ON a.token = b.token AND a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) >= 0.8
""",
    "e2_jaccard_capped": f"""
WITH toks0 AS (
  SELECT DISTINCT doc_id, lang, len_bucket, tok AS token FROM (
    SELECT doc_id, lang, n_chars // 100 AS len_bucket,
           unnest({TOKS_SQL}) AS tok
    FROM documents
  ) u WHERE tok <> ''
),
keep AS (SELECT token FROM toks0 GROUP BY token HAVING count(*) <= 390),
toks AS (SELECT t.* FROM toks0 t JOIN keep USING (token)),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM toks a JOIN toks b
    ON a.token = b.token AND a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) >= 0.8
""",
    "e7_dedup_clusters": f"""
WITH RECURSIVE toks AS (
  SELECT DISTINCT doc_id, lang, len_bucket, tok AS token FROM (
    SELECT doc_id, lang, n_chars // 100 AS len_bucket,
           unnest({TOKS_SQL}) AS tok
    FROM documents
  ) u WHERE tok <> ''
),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
pc AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM toks a JOIN toks b
    ON a.token = b.token AND a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jp AS (
  SELECT id_a, id_b
  FROM pc
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) >= 0.8
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM jp
),
reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(lab) AS cluster_id,
       min(lab) = node AS is_kept
FROM reach GROUP BY node
""",
    # r7 PageRank over the e7 pair graph: 3 unrolled fixed-point
    # iterations — contributions are truncating BIGINT divisions,
    # sums exact BIGINTs, the damping multiply mirrors the Spark
    # expression (0.85 * exact int, half-away round) term-for-term.
    # r11 label propagation: synchronous rounds unrolled; the argmax
    # (count DESC, label ASC) is row_number's order — all integers.
    "e7f_label_prop": f"""
WITH {PAIR_GRAPH_SQL.format(toks=TOKS_SQL)},
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM jp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM jp
),
l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
w1 AS (
  SELECT id, label FROM (
    SELECT e.dst AS id, l.label, count(*) AS cnt,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM edges e JOIN l0 l ON l.id = e.src GROUP BY e.dst, l.label
  ) x WHERE rn = 1
),
l1 AS MATERIALIZED (
  SELECT n.id, coalesce(w.label, n.label) AS label
  FROM l0 n LEFT JOIN w1 w ON w.id = n.id
),
w2 AS (
  SELECT id, label FROM (
    SELECT e.dst AS id, l.label, count(*) AS cnt,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM edges e JOIN l1 l ON l.id = e.src GROUP BY e.dst, l.label
  ) x WHERE rn = 1
),
l2 AS MATERIALIZED (
  SELECT n.id, coalesce(w.label, n.label) AS label
  FROM l1 n LEFT JOIN w2 w ON w.id = n.id
),
w3 AS (
  SELECT id, label FROM (
    SELECT e.dst AS id, l.label, count(*) AS cnt,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM edges e JOIN l2 l ON l.id = e.src GROUP BY e.dst, l.label
  ) x WHERE rn = 1
),
l3 AS (
  SELECT n.id, coalesce(w.label, n.label) AS label
  FROM l2 n LEFT JOIN w3 w ON w.id = n.id
)
SELECT id AS doc_id, label FROM l3
""",
    "e7d_pagerank": f"""
WITH {PAIR_GRAPH_SQL.format(toks=TOKS_SQL)},
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM jp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM jp
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
ew AS MATERIALIZED (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)
),
r0 AS (
  SELECT doc_id AS src, CAST(1000000 AS BIGINT) AS rank_micro
  FROM documents
),
s1 AS (
  SELECT ew.dst AS src, sum(r.rank_micro // ew.deg) AS s
  FROM ew JOIN r0 r ON ew.src = r.src GROUP BY 1
),
r1 AS MATERIALIZED (
  SELECT d.doc_id AS src,
         CAST(150000.0 + round(0.85 * CAST(coalesce(s1.s, 0) AS DOUBLE))
              AS BIGINT) AS rank_micro
  FROM documents d LEFT JOIN s1 ON s1.src = d.doc_id
),
s2 AS (
  SELECT ew.dst AS src, sum(r.rank_micro // ew.deg) AS s
  FROM ew JOIN r1 r ON ew.src = r.src GROUP BY 1
),
r2 AS MATERIALIZED (
  SELECT d.doc_id AS src,
         CAST(150000.0 + round(0.85 * CAST(coalesce(s2.s, 0) AS DOUBLE))
              AS BIGINT) AS rank_micro
  FROM documents d LEFT JOIN s2 ON s2.src = d.doc_id
),
s3 AS (
  SELECT ew.dst AS src, sum(r.rank_micro // ew.deg) AS s
  FROM ew JOIN r2 r ON ew.src = r.src GROUP BY 1
),
r3 AS (
  SELECT d.doc_id AS src,
         CAST(150000.0 + round(0.85 * CAST(coalesce(s3.s, 0) AS DOUBLE))
              AS BIGINT) AS rank_micro
  FROM documents d LEFT JOIN s3 ON s3.src = d.doc_id
)
SELECT src AS doc_id, rank_micro,
       CAST(rank_micro AS DOUBLE) / 1000000.0 AS rank
FROM r3
""",
    # r7 triangle counts: same oriented-wedge program — orientation
    # and wedge order both by (degree, id), closure via semi-join.
    "e7e_triangles": f"""
WITH {PAIR_GRAPH_SQL.format(toks=TOKS_SQL)},
edges AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM jp
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM jp
),
deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY 1),
ranked AS MATERIALIZED (
  SELECT e.u, e.v, dv.deg AS deg_v
  FROM edges e
  JOIN deg du ON du.u = e.u
  JOIN deg dv ON dv.u = e.v
  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
),
wedges AS (
  SELECT r1.u, r1.v, r2.v AS w
  FROM ranked r1 JOIN ranked r2 ON r1.u = r2.u
  WHERE r1.deg_v < r2.deg_v
     OR (r1.deg_v = r2.deg_v AND r1.v < r2.v)
),
closed AS (
  SELECT w.u FROM wedges w
  WHERE EXISTS (SELECT 1 FROM ranked r
                WHERE r.u = w.v AND r.v = w.w)
)
SELECT u AS apex_id, count(*) AS n_triangles
FROM closed GROUP BY 1
""",
    "e7c_dedup_keep_best": f"""
WITH RECURSIVE toks AS (
  SELECT DISTINCT doc_id, lang, len_bucket, tok AS token FROM (
    SELECT doc_id, lang, n_chars // 100 AS len_bucket,
           unnest({TOKS_SQL}) AS tok
    FROM documents
  ) u WHERE tok <> ''
),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
pc AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM toks a JOIN toks b
    ON a.token = b.token AND a.lang = b.lang AND a.len_bucket = b.len_bucket
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jp AS (
  SELECT id_a, id_b
  FROM pc
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) >= 0.8
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM jp
),
reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
best AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           row_number() OVER (
             PARTITION BY c.cluster_id
             ORDER BY d.n_chars DESC, c.doc_id ASC
           ) AS rn
    FROM comp c JOIN documents d USING (doc_id)
  ) t WHERE rn = 1
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN best b ON d.doc_id = b.doc_id
""",
    "e2_simhash_md5": f"""
WITH occ AS (
  SELECT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
votes AS (
  SELECT doc_id,
{_SH_VOTES}
  FROM occ GROUP BY 1
)
SELECT doc_id,
       CAST({_SH_LO} AS BIGINT) AS simhash_lo,
       CAST({_SH_HI} AS BIGINT) AS simhash_hi
FROM votes
""",
    # r12: the near-dup PAIR pipeline on the md5 bit family — same
    # fingerprint CTEs as e2_simhash_md5, then the EXACT blocking
    # condition the Spark op uses (any shared 16-bit chunk) and the
    # popcount(xor) hamming verify. The blocking must be reproduced,
    # not approximated away: at max_hamming=8 it is an approximate
    # blocker, so a full O(n²) oracle would FIND pairs the op
    # correctly misses.
    "e2_simhash_md5_dups": f"""
WITH occ AS (
  SELECT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
votes AS (
  SELECT doc_id,
{_SH_VOTES}
  FROM occ GROUP BY 1
),
fp AS (
  SELECT doc_id,
         CAST({_SH_LO} AS BIGINT) AS lo,
         CAST({_SH_HI} AS BIGINT) AS hi
  FROM votes
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.lo, b.lo))
            + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
 AND ( ((a.lo >>  0) & 65535) = ((b.lo >>  0) & 65535)
    OR ((a.lo >> 16) & 65535) = ((b.lo >> 16) & 65535)
    OR ((a.hi >>  0) & 65535) = ((b.hi >>  0) & 65535)
    OR ((a.hi >> 16) & 65535) = ((b.hi >> 16) & 65535) )
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 8
""",
    "e2_minhash_md5_pairs": f"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
sig AS (
  SELECT doc_id,
{_MH_SIG_AGGS}
  FROM toks GROUP BY 1
),
bands AS (
  SELECT doc_id,
         unnest(range(0, {_MH_BANDS})) AS band,
         unnest([{_MH_BAND_KEYS}]) AS band_key
  FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(({_MH_AGREE}) / {_MH_N}.0, 6) AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = id_a
JOIN sig sb ON sb.doc_id = id_b
WHERE round(({_MH_AGREE}) / {_MH_N}.0, 6) >= 0.7
""",
    "e7b_minhash_dedup_keep": f"""
WITH RECURSIVE toks AS (
  SELECT DISTINCT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
km AS ({_KM_HASHES}),
sig AS (
  SELECT doc_id,
{_KM_SIG_AGGS}
  FROM km GROUP BY 1
),
bands AS (
  SELECT doc_id,
         unnest(range(0, {_MH_BANDS})) AS band,
         unnest([{_KM_BAND_KEYS}]) AS band_key
  FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
jp AS (
  SELECT id_a, id_b
  FROM cand
  JOIN sig sa ON sa.doc_id = id_a
  JOIN sig sb ON sb.doc_id = id_b
  WHERE round(({_MH_AGREE}) / {_MH_N}.0, 6) >= 0.7
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM jp
),
reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
kept AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING min(lab) = node
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN kept USING (doc_id)
""",
    "e1b_incremental_dedup": """
WITH fp AS (
  SELECT doc_id, lang, n_chars,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
  FROM documents
)
SELECT n.doc_id, n.lang, n.n_chars
FROM fp n
WHERE n.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM fp c WHERE c.doc_id % 2 = 0 AND c.f = n.f
  )
""",
    # corpus_diff: same fingerprint as e1b (normalized-text md5); the
    # amended texts re-fingerprint to 'changed'
    "e1e_corpus_diff": """
WITH o AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents WHERE doc_id % 7 <> 0
),
n AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(
           CASE WHEN doc_id % 5 = 0 THEN text || ' amended' ELSE text END
         ), '\\s+', ' ', 'g'))) AS fp
  FROM documents WHERE doc_id % 3 <> 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.fp = n.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
""",
    # spans = consecutive 10-token chunks of the raw-space-split text;
    # a span is dropped when it occurs in >= 2 DISTINCT docs. DuckDB
    # list slicing toks[a:b] is 1-based inclusive with clamped end —
    # same spans as Spark's slice(toks, a, 10).
    "e1d_span_dedup": """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, i AS chunk_pos,
         array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS span
  FROM (SELECT doc_id, toks,
               unnest(range(0, CAST(ceil(len(toks)/10.0) AS BIGINT))) AS i
        FROM t WHERE trim(text) <> '')
),
f AS (
  SELECT span, true AS dup
  FROM (SELECT DISTINCT span, doc_id FROM c)
  GROUP BY span HAVING count(*) >= 2
),
a AS (
  SELECT c.doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(CASE WHEN f.dup IS NULL THEN 1 END) AS BIGINT)
           AS n_kept,
         coalesce(string_agg(CASE WHEN f.dup IS NULL THEN c.span END,
                             ' ' ORDER BY c.chunk_pos), '') AS new_text
  FROM c LEFT JOIN f USING (span) GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(a.new_text, '') AS text,
       coalesce(a.n_chunks, 0) AS n_chunks,
       coalesce(a.n_kept, 0) AS n_kept
FROM documents d LEFT JOIN a USING (doc_id)
""",
    "e1c_incremental_minhash": f"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
km AS ({_KM_HASHES}),
sig AS (
  SELECT doc_id,
{_KM_SIG_AGGS}
  FROM km GROUP BY 1
),
bands AS (
  SELECT doc_id,
         unnest(range(0, {_MH_BANDS})) AS band,
         unnest([{_KM_BAND_KEYS}]) AS band_key
  FROM sig
),
hit AS (
  SELECT DISTINCT a.doc_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = d.doc_id)
""",
    "e2_minhash_km_pairs": f"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
km AS ({_KM_HASHES}),
sig AS (
  SELECT doc_id,
{_KM_SIG_AGGS}
  FROM km GROUP BY 1
),
bands AS (
  SELECT doc_id,
         unnest(range(0, {_MH_BANDS})) AS band,
         unnest([{_KM_BAND_KEYS}]) AS band_key
  FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(({_MH_AGREE}) / {_MH_N}.0, 6) AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = id_a
JOIN sig sb ON sb.doc_id = id_b
WHERE round(({_MH_AGREE}) / {_MH_N}.0, 6) >= 0.7
""",
    "e2_embedding_near_dups": f"""
WITH wb AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding', 6)} AS bucket FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cosine
FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.4
""",
    # SemDeDup: same deterministic quantizer as the IVF oracles
    # (centroids = vec_id < 16, argmax rounded cosine, tie → lowest
    # cid); a vector is a dup when a LOWER-id cell-mate sits at
    # cosine >= 0.4
    "e2_semdedup": f"""
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
dups AS (
  SELECT DISTINCT a.vec_id
  FROM cells a JOIN cells b
    ON a.cid = b.cid AND b.vec_id < a.vec_id
  WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.4
)
SELECT c.vec_id, c.cid, d.vec_id IS NULL AS keep
FROM cells c LEFT JOIN dups d ON c.vec_id = d.vec_id
""",
    # winnowing (SIGMOD'03): grams = md5 of each char 8-gram of the
    # normalized text; fingerprints = distinct minima of each
    # 4-window. DuckDB range() is upper-EXCLUSIVE (Spark sequence is
    # inclusive → +1) and list slices are 1-based inclusive both ends
    # with clamping, matching Spark's slice(g, j, 4).
    "e2_winnow_pairs": """
WITH nz AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(t) - 7, 1) + 1),
                        i -> md5(substr(t, CAST(i AS INT), 8))) AS grams
  FROM nz WHERE length(t) > 0
),
fp AS (
  SELECT DISTINCT doc_id, unnest(fps) AS fingerprint FROM (
    SELECT doc_id,
           list_distinct(
             list_transform(range(1, greatest(len(grams) - 3, 1) + 1),
                            j -> list_min(grams[CAST(j AS INT):CAST(j + 3 AS INT)]))
           ) AS fps
    FROM g
  ) w
),
kept AS (
  SELECT fp.doc_id, fp.fingerprint
  FROM fp JOIN (
    SELECT fingerprint FROM fp GROUP BY 1 HAVING count(*) <= 50
  ) ok USING (fingerprint)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b USING (fingerprint)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
""",
    # r7 sorted-neighborhood blocking: rank by (12-char normalized
    # prefix, doc_id), pair everything within a width-4 window.
    "e2_snm_pairs": """
WITH k AS (
  SELECT doc_id,
         coalesce(substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                         1, 12), '') AS sk
  FROM documents
),
r AS (
  SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) - 1 AS rnk FROM k
)
SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_id_a,
       greatest(a.doc_id, b.doc_id) AS doc_id_b
FROM r a JOIN r b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 3
""",
}

# r6: edit-distance verification of the winnow candidates — reuses
# the winnow-pairs query verbatim as the candidate CTE so the two
# twins can never drift apart.
ORACLE_SQL["e2_edit_verified"] = f"""
WITH winnow AS ({ORACLE_SQL["e2_winnow_pairs"]}),
cand AS (SELECT id_a, id_b FROM winnow WHERE n_shared >= 4),
t AS (
  SELECT doc_id,
         substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                1, 200) AS t
  FROM documents
)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
       round(levenshtein(a.t, b.t)
             / CAST(greatest(length(a.t), length(b.t), 1) AS DOUBLE),
             6) AS rel_dist
FROM cand c
JOIN t a ON c.id_a = a.doc_id
JOIN t b ON c.id_b = b.doc_id
WHERE round(levenshtein(a.t, b.t)
            / CAST(greatest(length(a.t), length(b.t), 1) AS DOUBLE),
            6) <= 0.5
"""
