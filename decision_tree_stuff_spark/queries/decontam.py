"""Benchmark decontamination (E-9): n-gram, Bloom, semantic (+IVF staging), contamination spans.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    BLOOM_T,
    DECON_N,
    DECON_THRESHOLD,
    TOKS_SQL,
    _BLOOM_K,
    _BLOOM_M,
    _cos_sql,
    _docs,
    _emb,
)



def q_e9_decontamination(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 7 == 0 play the
    eval set; flag training docs containing ≥ 20% of a benchmark
    doc's token 3-grams (asymmetric containment, not Jaccard — a
    leaked benchmark item inside a long doc must still score 1.0)."""
    from decision_tree_stuff_spark.operators.decontam import ngram_contamination

    docs = _docs(spark, sf_dir)
    return ngram_contamination(
        docs.where("doc_id % 7 <> 0"),
        docs.where("doc_id % 7 = 0"),
        n=DECON_N,
        threshold=DECON_THRESHOLD,
    )


def q_e9c_semantic_decontam(spark, sf_dir):
    """Semantic decontamination (r8, E-9c): every corpus embedding
    scored by its max cosine against the benchmark embedding set
    (vec_id % 7 == 0 plays the eval set) — the fuzzy complement to
    the n-gram/Bloom checks that paraphrased leaks walk past. The
    benchmark side broadcasts; the corpus never shuffles (one
    max-struct aggregate keyed on the corpus id). exact=True pins the
    brute-force BASELINE path — production auto-routes to the IVF
    staging above ivf_bench_bound (e9c_ivf_decontam is that row).

    The eval set is FIXED BY NATURE — a benchmark doesn't grow with
    the corpus — so the bench side is pinned to replica-0 ids
    (vec_id < the scaled-replica ID_STRIDE; a no-op at the driver's
    sf, where every id is below it). Scaling runs then measure the
    production shape: pairs linear in |corpus|, not quadratic in sf
    (r9; both engines, twin identical)."""
    from decision_tree_stuff_spark.operators.decontam import (
        embedding_decontamination,
    )

    emb = _emb(spark, sf_dir)
    return embedding_decontamination(
        emb.where("vec_id % 7 <> 0"),
        emb.where("vec_id % 7 = 0 AND vec_id < 10000000"),
        threshold=0.8,
        exact=True,
    )


def q_e9d_contamination_spans(spark, sf_dir):
    """Contamination SPAN report (r8, E-9d): for every contaminated
    (train, bench) pair, the merged token spans of the train doc that
    matched benchmark 3-grams — the audit/redaction artifact (strip
    the span instead of dropping the doc). Gram intervals merge via
    the gaps-and-islands two-window program; all-integer, exact."""
    from decision_tree_stuff_spark.operators.decontam import (
        contamination_spans,
    )

    docs = _docs(spark, sf_dir)
    return contamination_spans(
        docs.where("doc_id % 7 <> 0"),
        docs.where("doc_id % 7 = 0"),
        n=DECON_N,
        threshold=DECON_THRESHOLD,
    )


def q_e9c_ivf_decontam(spark, sf_dir):
    """IVF-staged semantic decontamination (r8): the scale path of
    e9c as code — both sides coarse-quantize against the corpus
    'first' quantizer, corpus keeps its home cell, bench probes its
    2 nearest cells, only cell-mates verify. Approximate by
    construction; the oracle reproduces the same quantizer, probes
    and arg-max. Bench pinned to replica-0 ids like e9c (the eval set
    is fixed by nature; no-op at driver sf)."""
    from decision_tree_stuff_spark.operators.decontam import (
        embedding_decontamination_ivf,
    )

    emb = _emb(spark, sf_dir)
    return embedding_decontamination_ivf(
        emb.where("vec_id % 7 <> 0"),
        emb.where("vec_id % 7 = 0 AND vec_id < 10000000"),
        threshold=0.8,
        n_centroids=16,
        nprobe=2,
    )


def q_e9_bloom_decontam(spark, sf_dir):
    """Bloom-filter contamination scan (r7): same eval split as e9,
    but membership against the UNION of benchmark 3-grams via a
    broadcast bitset literal — the corpus side is a pure projection
    (zero shuffle), the 100 TB-shaped decontamination pass. False
    positives are deterministic given (md5, m, k), so the DuckDB twin
    reproduces them exactly via the equivalent position-set
    semi-join."""
    from decision_tree_stuff_spark.operators.decontam import bloom_contamination

    docs = _docs(spark, sf_dir)
    return bloom_contamination(
        docs.where("doc_id % 7 <> 0"),
        docs.where("doc_id % 7 = 0"),
        n=DECON_N,
        threshold=BLOOM_T,
    )

def q_e9b_bloom_stats(spark, sf_dir):
    """Bloom saturation accounting (r12): the one-row
    (m_bits, k, n_grams, n_set, fill_ratio, expected_fpr) card for
    the filter the e9_bloom_decontam row probes — the number that
    says whether m/k are sized for THIS benchmark before the
    zero-shuffle pass runs (a saturated filter deletes everything).
    Exact distinct-position count, fixed-order multiplication chain
    for the FPR (libm pow is not bit-specified; products are)."""
    from decision_tree_stuff_spark.operators.decontam import bloom_stats

    docs = _docs(spark, sf_dir)
    return bloom_stats(docs.where("doc_id % 7 = 0"), n=DECON_N)


def q_e9e_substring_decontam(spark, sf_dir):
    """ExactSubstr decontamination (r11, E-9e — the deterministic end
    of the decontam family): every maximal verbatim run ≥ 25
    normalized chars a train doc shares with a bench doc, exact
    positions + length — the span-precise "test-set membership" case
    n-gram fraction scoring, Bloom, and semantic decontam all blur.
    Same corpus/bench split as the other e9 rows; max_df=50 matches
    the e1f dedup row (engine-stable cap)."""
    from decision_tree_stuff_spark.operators.decontam import (
        exact_substring_decontam,
    )

    docs = _docs(spark, sf_dir)
    return exact_substring_decontam(
        docs.where("doc_id % 7 <> 0"),
        docs.where("doc_id % 7 = 0"),
        min_len=25,
        max_df=50,
    )


ORACLE_SQL: Dict[str, str] = {
    # r11 ExactSubstr decontam twin: the e1f anchor/diagonal program
    # with a side split — the max_df cap still sees BOTH sides (the
    # union is all documents), matching the operator exactly.
    "e9e_substring_decontam": """
WITH nz AS (
  SELECT doc_id, doc_id % 7 = 0 AS is_bench,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
posns AS (
  SELECT doc_id, is_bench, t,
         CAST(unnest(range(1, CAST(length(t) AS BIGINT) - 23)) AS INT) AS pos
  FROM nz WHERE length(t) >= 25
),
anch AS (
  SELECT doc_id, is_bench, pos, md5(substr(t, pos, 25)) AS g FROM posns
),
ok AS (SELECT g FROM anch GROUP BY g HAVING count(*) <= 50),
kept AS (SELECT a.* FROM anch a JOIN ok USING (g)),
p AS (
  SELECT a.doc_id AS doc_id, a.pos AS pos_a,
         b.doc_id AS bench_id, b.pos AS pos_b
  FROM kept a JOIN kept b USING (g)
  WHERE NOT a.is_bench AND b.is_bench
),
r AS (
  SELECT doc_id, bench_id, pos_a - pos_b AS diag, pos_a,
         pos_a - CAST(row_number() OVER (
           PARTITION BY doc_id, bench_id, pos_a - pos_b ORDER BY pos_a
         ) AS INT) AS isl
  FROM p
)
SELECT doc_id, bench_id,
       CAST(min(pos_a) AS INT) AS pos,
       CAST(min(pos_a) - diag AS INT) AS bench_pos,
       CAST(25 + count(*) - 1 AS INT) AS match_len
FROM r GROUP BY doc_id, bench_id, diag, isl
""",
    "e9_decontamination": f"""
WITH grams AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks) - {DECON_N} + 2, 1)),
             i -> array_to_string(toks[i:i + {DECON_N} - 1], ' '))) AS gram
    FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
          FROM documents) d
  ) g GROUP BY 1, 2
),
tg AS (SELECT doc_id AS train_id, gram FROM grams WHERE train_id % 7 <> 0),
bg AS (SELECT doc_id AS bench_id, gram FROM grams WHERE bench_id % 7 = 0),
sizes AS (SELECT bench_id, CAST(count(*) AS BIGINT) AS bench_n FROM bg GROUP BY 1),
matched AS (
  SELECT train_id, bench_id, CAST(count(*) AS BIGINT) AS matched
  FROM tg JOIN bg USING (gram) GROUP BY 1, 2
)
SELECT train_id, bench_id, matched, bench_n,
       round(matched / CAST(bench_n AS DOUBLE), 6) AS containment
FROM matched JOIN sizes USING (bench_id)
WHERE round(matched / CAST(bench_n AS DOUBLE), 6) >= {DECON_THRESHOLD}
""",
    # r8 semantic decontamination: arg-max cosine vs the broadcast
    # benchmark set, ties to the lowest bench id (the max-struct
    # winner), same _cos_sql fold parity as the e3 rows. r10 (advice):
    # LEFT JOIN the best match back onto the corpus + coalesce false,
    # mirroring the e9c_ivf_decontam oracle — the exact path's
    # keep-with-null contract (empty bench set / zero-norm corpus
    # vectors are KEPT with contaminated=false, cos NULL), which the
    # old inner-join + bare `cos >= 0.8` form diverged from on those
    # degenerate inputs.
    "e9c_semantic_decontam": f"""
WITH bench AS (
  SELECT vec_id AS bid, embedding AS bvec FROM embeddings
  WHERE vec_id % 7 = 0 AND vec_id < 10000000
),
corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 0
),
scored AS (
  SELECT c.vec_id, round({_cos_sql('c.embedding', 'b.bvec')}, 6) AS cos,
         b.bid
  FROM corpus c CROSS JOIN bench b
),
best AS (
  SELECT vec_id, cos, bid
  FROM (SELECT vec_id, cos, bid,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, bid ASC) AS rn
        FROM scored) t
  WHERE rn = 1 AND cos IS NOT NULL
)
SELECT c.vec_id, b.cos AS max_bench_cos, b.bid AS bench_id,
       coalesce(b.cos >= 0.8, false) AS contaminated
FROM corpus c LEFT JOIN best b USING (vec_id)
""",
    # r8 contamination spans: flagged pairs (same program as e9) +
    # positional train grams + the two-window islands merge (the e10c
    # pattern), adjacency included (s > prev_max_e + 1 breaks).
    "e9d_contamination_spans": f"""
WITH toks AS (
  SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks FROM documents
),
g AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks) - {DECON_N} + 2, 1)),
             i -> array_to_string(toks[i:i + {DECON_N} - 1], ' '))) AS gram
    FROM toks) gg
  GROUP BY 1, 2
),
tg AS (SELECT doc_id AS train_id, gram FROM g WHERE doc_id % 7 <> 0),
bg AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 7 = 0),
sizes AS (SELECT bench_id, CAST(count(*) AS BIGINT) AS bench_n
          FROM bg GROUP BY 1),
flagged AS (
  SELECT train_id, bench_id
  FROM (SELECT train_id, bench_id, CAST(count(*) AS BIGINT) AS matched
        FROM tg JOIN bg USING (gram) GROUP BY 1, 2) m
  JOIN sizes USING (bench_id)
  WHERE round(matched / CAST(bench_n AS DOUBLE), 6) >= {DECON_THRESHOLD}
),
tpos AS (
  SELECT doc_id AS train_id, u.pos AS pos, u.gram AS gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks) - {DECON_N} + 2, 1)),
             i -> {{'pos': i,
                    'gram': array_to_string(toks[i:i + {DECON_N} - 1], ' ')}}))
             AS u
    FROM toks WHERE doc_id % 7 <> 0) q
),
hits AS (
  SELECT t.train_id, b.bench_id, t.pos AS s, t.pos + {DECON_N - 1} AS e
  FROM tpos t JOIN bg b USING (gram)
  JOIN flagged f ON t.train_id = f.train_id AND b.bench_id = f.bench_id
),
marked AS (
  SELECT train_id, bench_id, s, e,
         CASE WHEN s > coalesce(
                max(e) OVER (PARTITION BY train_id, bench_id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING),
                CAST(-9223372036854775807 AS BIGINT)) + 1
              THEN 1 ELSE 0 END AS ni
  FROM hits
),
iid AS (
  SELECT *, sum(ni) OVER (PARTITION BY train_id, bench_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS iid
  FROM marked
)
SELECT train_id, bench_id,
       CAST(min(s) AS INT) AS start_tok,
       CAST(max(e) AS INT) AS end_tok,
       CAST(max(e) - min(s) + 1 AS INT) AS span_tokens
FROM iid GROUP BY train_id, bench_id, iid
""",
    # r8 IVF-staged semantic decontam: corpus 'first' quantizer
    # (lowest-id CORPUS vectors below 16), home-cell corpus
    # assignment, nprobe=2 bench probes, arg-max over cell-mates.
    "e9c_ivf_decontam": f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  WHERE vec_id < 16 AND vec_id % 7 <> 0
),
corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 0
),
bench AS (
  SELECT vec_id AS bid, embedding AS bvec FROM embeddings
  WHERE vec_id % 7 = 0 AND vec_id < 10000000
),
casg AS (
  SELECT c.vec_id, c.embedding, t.cid,
         row_number() OVER (PARTITION BY c.vec_id
           ORDER BY round({_cos_sql('c.embedding', 't.cvec')}, 6) DESC,
                    t.cid ASC) AS rn
  FROM corpus c CROSS JOIN cent t
),
ccells AS (SELECT vec_id, embedding, cid FROM casg WHERE rn = 1),
basg AS (
  SELECT b.bid, b.bvec, t.cid,
         row_number() OVER (PARTITION BY b.bid
           ORDER BY round({_cos_sql('b.bvec', 't.cvec')}, 6) DESC,
                    t.cid ASC) AS rn
  FROM bench b CROSS JOIN cent t
),
s AS (
  SELECT cc.vec_id,
         round({_cos_sql('cc.embedding', 'b.bvec')}, 6) AS cos, b.bid
  FROM ccells cc JOIN (SELECT bid, bvec, cid FROM basg WHERE rn <= 2) b
    USING (cid)
),
best AS (
  SELECT vec_id, cos, bid FROM (
    SELECT vec_id, cos, bid,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, bid ASC) AS rn
    FROM s) t
  WHERE rn = 1
)
SELECT c.vec_id, b.cos AS max_bench_cos, b.bid AS bench_id,
       coalesce(b.cos >= 0.8, false) AS contaminated
FROM corpus c LEFT JOIN best b USING (vec_id)
""",
    # Bloom membership twin: a bit is set iff its position is in the
    # benchmark position set, so the bitset probe == position-set
    # semi-join — false positives (position collisions) reproduce
    # exactly. Hashing = the md5km scheme already parity-proven above.
    # r12: saturation card twin — same gram/position program as the
    # decontam twin below, aggregated; FPR written as the identical
    # (f*f)*f chain.
    "e9b_bloom_stats": f"""
WITH grams AS (
  SELECT DISTINCT gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks) - {DECON_N} + 2, 1)),
             i -> array_to_string(toks[i:i + {DECON_N} - 1], ' '))) AS gram
    FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
          FROM documents WHERE doc_id % 7 = 0) d
  ) g WHERE gram <> ''
),
ii AS (SELECT unnest(range(0, {_BLOOM_K})) AS i),
pos AS (
  SELECT DISTINCT
    (('0x' || substr(md5(gram), 1, 15))::BIGINT
     + ii.i * ('0x' || substr(md5(gram), 17, 15))::BIGINT) % {_BLOOM_M} AS pos
  FROM grams, ii
),
agg AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM grams) AS n_grams,
         (SELECT CAST(count(*) AS BIGINT) FROM pos) AS n_set
)
SELECT CAST({_BLOOM_M} AS BIGINT) AS m_bits,
       CAST({_BLOOM_K} AS INT) AS k,
       n_grams,
       n_set,
       round(CAST(n_set AS DOUBLE) / {float(_BLOOM_M)!r}, 6) AS fill_ratio,
       round(((CAST(n_set AS DOUBLE) / {float(_BLOOM_M)!r})
              * (CAST(n_set AS DOUBLE) / {float(_BLOOM_M)!r}))
             * (CAST(n_set AS DOUBLE) / {float(_BLOOM_M)!r}), 6)
         AS expected_fpr
FROM agg
""",
    "e9_bloom_decontam": f"""
WITH grams AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks) - {DECON_N} + 2, 1)),
             i -> array_to_string(toks[i:i + {DECON_N} - 1], ' '))) AS gram
    FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
          FROM documents) d
  ) g GROUP BY 1, 2
),
ii AS (SELECT unnest(range(0, {_BLOOM_K})) AS i),
bpos AS (
  SELECT DISTINCT
    (('0x' || substr(md5(gram), 1, 15))::BIGINT
     + ii.i * ('0x' || substr(md5(gram), 17, 15))::BIGINT) % {_BLOOM_M} AS pos
  FROM (SELECT DISTINCT gram FROM grams WHERE doc_id % 7 = 0) bg, ii
),
tpos AS (
  SELECT doc_id, gram,
    (('0x' || substr(md5(gram), 1, 15))::BIGINT
     + ii.i * ('0x' || substr(md5(gram), 17, 15))::BIGINT) % {_BLOOM_M} AS pos
  FROM grams, ii WHERE doc_id % 7 <> 0
),
gramhit AS (
  SELECT t.doc_id, t.gram, count(b.pos) = {_BLOOM_K} AS hit
  FROM tpos t LEFT JOIN bpos b ON t.pos = b.pos
  GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM gramhit GROUP BY 1
)
SELECT doc_id, n_grams, n_hit,
       round(n_hit / CAST(n_grams AS DOUBLE), 6) AS hit_frac
FROM agg
WHERE round(n_hit / CAST(n_grams AS DOUBLE), 6) >= {BLOOM_T}
""",
}
