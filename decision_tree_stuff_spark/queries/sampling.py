"""Sampling & selection (E-8): uniform/stratified/weighted/DSIR/temperature, splits, packing, budgets.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    BUDGETS,
    BUDGET_SEED,
    F,
    PACK_SEED,
    PACK_SEQ_LEN,
    SAMPLE_RATE,
    SAMPLE_SEED,
    SHUFFLE_SEED,
    SPLIT_FRACTIONS,
    SPLIT_SEED,
    STRATA_DEFAULT,
    STRATA_RATES,
    STRATA_SEED,
    TOKS_SQL,
    _docs,
    ngram_jaccard_pairs,
    rate_threshold,
)



def q_e8_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment — disjoint,
    exhaustive, stable across reruns (unlike rand()-based splits)."""
    from decision_tree_stuff_spark.operators.sampling import hash_split

    return hash_split(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        SPLIT_FRACTIONS,
        ["doc_id"],
        seed=SPLIT_SEED,
    )


def q_e8_weighted_sample(spark, sf_dir):
    """Weighted per-group sampling (r7, Efraimidis-Spirakis): 10 docs
    per language with inclusion probability proportional to n_chars —
    deterministic (md5-derived uniforms), without replacement."""
    from decision_tree_stuff_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    return weighted_sample_per_group(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        group_cols=["lang"],
        n=10,
        weight_col="n_chars",
        key_cols=["doc_id"],
        seed="ws7",
    )


def q_e8_dsir_sample(spark, sf_dir):
    """DSIR data selection (r7, Xie et al. NeurIPS'23): hashed
    unigram+bigram importance weights log w = sum c_b (lp_target -
    lp_raw) — target model from the even-id English docs, raw model
    from all even-id docs — then a Gumbel top-k resample of 50 odd-id
    docs with probability proportional to exp(log w), without
    replacement. The published pretraining-corpus selection recipe as
    counts + joins + one window."""
    from decision_tree_stuff_spark.operators import pushdown_fence
    from decision_tree_stuff_spark.operators.selection import (
        dsir_log_weights_from_features,
        dsir_model_from_features,
        gumbel_topk_sample,
        hashed_ngram_features,
    )

    docs = _docs(spark, sf_dir)
    # ONE featurize pass over the whole corpus (the md5-per-gram
    # digest is the dominant cost), lang carried through; the fence
    # keeps the parity/lang slices from being pushed below the
    # feature aggregation's Exchange, so all three consumers (target
    # model, raw model, scorer) hit ReuseExchange instead of each
    # re-running the featurizer (r7 verdict: 3 passes → 1).
    feats = pushdown_fence(
        hashed_ngram_features(docs, n_buckets=4096, carry=["lang"])
    )
    hist = feats.where(F.col("doc_id") % 2 == 0)
    target = dsir_model_from_features(
        hist.where(F.col("lang") == "en"), n_buckets=4096
    )
    raw = dsir_model_from_features(hist, n_buckets=4096)
    weights = dsir_log_weights_from_features(
        feats.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 1).select("doc_id"),
        target,
        raw,
    )
    return gumbel_topk_sample(
        weights, 50, "log_weight", ["doc_id"], seed="dsir7"
    )


def q_e8_temperature_sample(spark, sf_dir):
    """Temperature-scaled mixture sample (r7, mT5-style alpha
    sampling): a 100-doc budget allocated across languages
    proportional to count^0.5 (largest-remainder exact allocation),
    rows picked in deterministic md5 order."""
    from decision_tree_stuff_spark.operators.sampling import (
        temperature_sample,
    )

    return temperature_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        "lang",
        total_n=100,
        alpha=0.5,
        key_cols=["doc_id"],
        seed="t7",
    )


def q_e8_cap_per_group(spark, sf_dir):
    """Per-group quota (the per-domain cap of web-corpus pipelines):
    keep at most 50 docs per language, selected by deterministic
    md5-hash order."""
    from decision_tree_stuff_spark.operators.sampling import cap_per_group

    return cap_per_group(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        group_cols=["lang"],
        n=50,
        key_cols=["doc_id"],
        seed="cap1",
    )


def q_e8b_leakage_safe_split(spark, sf_dir):
    """Near-dup-cluster-aware split: Jaccard pairs (same family as the
    e7 gate) → connected components → hash-split BY CLUSTER, so near-
    duplicates never straddle train/val/test."""
    from decision_tree_stuff_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    pairs = ngram_jaccard_pairs(
        docs, block_cols=["lang", "len_bucket"], threshold=0.8
    )
    return leakage_safe_split(
        docs, pairs, SPLIT_FRACTIONS, seed="lsafe"
    )


def q_e8_kfold(spark, sf_dir):
    """Deterministic 5-fold CV assignment: md5-prefix integer mod k —
    shuffle-free, retry-stable, engine-portable arithmetic."""
    from decision_tree_stuff_spark.operators.sampling import k_fold

    return k_fold(
        _docs(spark, sf_dir).select("doc_id", "lang"), 5, ["doc_id"],
        seed="cv",
    )


def q_e8_sample(spark, sf_dir):
    """Hash-deterministic 20% corpus sample — pure filter, no shuffle,
    stable under task retries (unlike ``DataFrame.sample``)."""
    from decision_tree_stuff_spark.operators.sampling import deterministic_sample

    return deterministic_sample(
        _docs(spark, sf_dir), SAMPLE_RATE, ["doc_id"], seed=SAMPLE_SEED
    ).select("doc_id", "lang", "source", "n_chars")


def q_e8_stratified_sample(spark, sf_dir):
    """Per-language mixture weights (the corpus-recipe op): en 50%,
    de 25%, fr 10%, everything else 5%."""
    from decision_tree_stuff_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir),
        "lang",
        STRATA_RATES,
        ["doc_id"],
        seed=STRATA_SEED,
        default_rate=STRATA_DEFAULT,
    ).select("doc_id", "lang", "n_chars")


def q_e8_budget_sample(spark, sf_dir):
    """Budget-filling mixture sample: fill a 20k-char English budget
    and an 8k-char German budget deterministically (hash-first order);
    languages without a budget drop out. The exact-budget counterpart
    of the rate-based e8_stratified_sample."""
    from decision_tree_stuff_spark.operators.sampling import sample_to_budget

    return sample_to_budget(
        _docs(spark, sf_dir),
        "lang",
        BUDGETS,
        ["doc_id"],
        seed=BUDGET_SEED,
        weight_col="n_chars",
    ).select("doc_id", "lang", "n_chars")


def q_e8_global_shuffle(spark, sf_dir):
    """Deterministic global permutation with exact 0-based positions —
    two-phase bucketed rank (no single-task window); oracle is the
    naive single-node row_number."""
    from decision_tree_stuff_spark.operators.sampling import global_shuffle

    return global_shuffle(
        _docs(spark, sf_dir).select("doc_id"), ["doc_id"], seed=SHUFFLE_SEED
    )


def q_e8_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing layout at seq_len=512: shuffle-ordered
    exclusive token prefix-sum → (pack_id, pack_offset) per doc."""
    from decision_tree_stuff_spark.operators.sampling import pack_sequences
    from decision_tree_stuff_spark.functions.text import token_count

    docs = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(
        docs, "n_tokens", PACK_SEQ_LEN, ["doc_id"], seed=PACK_SEED
    )


def q_e8_pack_materialize(spark, sf_dir):
    """Physical sequence packing at seq_len=512: the packed token
    chunks themselves, straddling docs split across pack boundaries.
    pack_text joins each pack's tokens so the oracle compares scalar
    columns (driver value-hash does not traverse arrays)."""
    from decision_tree_stuff_spark.operators.sampling import pack_materialize
    from decision_tree_stuff_spark.functions.text import tokens

    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    packed = pack_materialize(docs, "toks", PACK_SEQ_LEN, ["doc_id"], seed=PACK_SEED)
    return packed.select(
        "pack_id",
        "n_tokens",
        F.concat_ws(" ", F.col("tokens")).alias("pack_text"),
    )

ORACLE_SQL: Dict[str, str] = {
    "e8_sample": f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE md5('{SAMPLE_SEED}|' || CAST(doc_id AS VARCHAR))
      < '{rate_threshold(SAMPLE_RATE)}'
""",
    "e8_kfold": f"""
SELECT doc_id, lang,
       CAST(('0x' || substr(md5('cv|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 5 AS INT) AS fold
FROM documents
""",
    "e8_stratified_sample": f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE md5('{STRATA_SEED}|' || CAST(doc_id AS VARCHAR)) <
      CASE lang
        WHEN 'de' THEN '{rate_threshold(STRATA_RATES["de"])}'
        WHEN 'en' THEN '{rate_threshold(STRATA_RATES["en"])}'
        WHEN 'fr' THEN '{rate_threshold(STRATA_RATES["fr"])}'
        ELSE '{rate_threshold(STRATA_DEFAULT)}'
      END
""",
    # CASE edges below use the SAME Python accumulation as
    # sampling.hash_split (sorted split names, cumulative floats) so
    # both engines compare against byte-identical threshold strings.
    "e8_hash_split": (
        lambda names, edges: f"""
SELECT doc_id, lang,
       CASE
         WHEN md5('{SPLIT_SEED}|' || CAST(doc_id AS VARCHAR)) < '{edges[0]}'
           THEN '{names[0]}'
         WHEN md5('{SPLIT_SEED}|' || CAST(doc_id AS VARCHAR)) < '{edges[1]}'
           THEN '{names[1]}'
         ELSE '{names[2]}'
       END AS split
FROM documents
"""
    )(
        sorted(SPLIT_FRACTIONS),
        [
            rate_threshold(sorted(SPLIT_FRACTIONS.items())[0][1]),
            rate_threshold(
                sorted(SPLIT_FRACTIONS.items())[0][1]
                + sorted(SPLIT_FRACTIONS.items())[1][1]
            ),
        ],
    ),
    "e8_global_shuffle": f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{SHUFFLE_SEED}|' || CAST(doc_id AS VARCHAR)), doc_id
       ) - 1 AS BIGINT) AS shuffle_pos
FROM documents
""",
    # r7 Efraimidis-Spirakis: rank key ln(u)/w, u = (first-15-hex of
    # md5 + 1) / 16^15 — identical integer-then-double math both sides
    "e8_weighted_sample": """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
           ORDER BY ln((('0x' || substr(md5('ws7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1.0)
                       / 1152921504606846976.0)
                    / CAST(n_chars AS DOUBLE) DESC,
                    doc_id ASC) AS rn
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
) t WHERE rn <= 10
""",
    # r7 DSIR: hashed n-gram importance weights + Gumbel top-k
    "e8_dsir_sample": f"""
WITH tf_feats AS (
  SELECT doc_id, bucket, count(*) AS c FROM (
    SELECT doc_id,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT % 4096 AS bucket
    FROM (
      SELECT doc_id, unnest(toks) AS gram
      FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
            FROM documents WHERE doc_id % 2 = 0 AND lang = 'en')
      UNION ALL
      SELECT doc_id, w1 || chr(1) || w2 AS gram FROM (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM (SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) AS pos
              FROM (SELECT doc_id,
                           list_filter({TOKS_SQL}, t -> t <> '') AS toks
                    FROM documents WHERE doc_id % 2 = 0 AND lang = 'en') b)
      ) x WHERE w2 IS NOT NULL
    ) g
  ) h GROUP BY 1, 2
),
rf_feats AS (
  SELECT doc_id, bucket, count(*) AS c FROM (
    SELECT doc_id,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT % 4096 AS bucket
    FROM (
      SELECT doc_id, unnest(toks) AS gram
      FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
            FROM documents WHERE doc_id % 2 = 0)
      UNION ALL
      SELECT doc_id, w1 || chr(1) || w2 AS gram FROM (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM (SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) AS pos
              FROM (SELECT doc_id,
                           list_filter({TOKS_SQL}, t -> t <> '') AS toks
                    FROM documents WHERE doc_id % 2 = 0) b)
      ) x WHERE w2 IS NOT NULL
    ) g
  ) h GROUP BY 1, 2
),
sf_feats AS (
  SELECT doc_id, bucket, count(*) AS c FROM (
    SELECT doc_id,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT % 4096 AS bucket
    FROM (
      SELECT doc_id, unnest(toks) AS gram
      FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
            FROM documents WHERE doc_id % 2 = 1)
      UNION ALL
      SELECT doc_id, w1 || chr(1) || w2 AS gram FROM (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM (SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) AS pos
              FROM (SELECT doc_id,
                           list_filter({TOKS_SQL}, t -> t <> '') AS toks
                    FROM documents WHERE doc_id % 2 = 1) b)
      ) x WHERE w2 IS NOT NULL
    ) g
  ) h GROUP BY 1, 2
),
t_model AS (
  SELECT bucket, ln((sum(c) + 1.0)
                    / ((SELECT sum(c) FROM tf_feats) + 4096.0)) AS lp
  FROM tf_feats GROUP BY 1
),
t_floor AS (SELECT ln(1.0 / ((SELECT sum(c) FROM tf_feats) + 4096.0)) AS fl),
r_model AS (
  SELECT bucket, ln((sum(c) + 1.0)
                    / ((SELECT sum(c) FROM rf_feats) + 4096.0)) AS lp
  FROM rf_feats GROUP BY 1
),
r_floor AS (SELECT ln(1.0 / ((SELECT sum(c) FROM rf_feats) + 4096.0)) AS fl),
w AS (
  SELECT s.doc_id, CAST(sum(s.c) AS BIGINT) AS n_grams,
         round(sum(s.c * (coalesce(t.lp, tf.fl) - coalesce(r.lp, rf.fl))),
               6) AS log_weight
  FROM sf_feats s
  LEFT JOIN t_model t USING (bucket)
  LEFT JOIN r_model r USING (bucket)
  CROSS JOIN t_floor tf CROSS JOIN r_floor rf
  GROUP BY 1
),
wd AS (
  SELECT d.doc_id, coalesce(w.n_grams, 0) AS n_grams,
         coalesce(w.log_weight, 0.0) AS log_weight
  FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 2 = 1) d
  LEFT JOIN w USING (doc_id)
)
SELECT doc_id, n_grams, log_weight FROM (
  SELECT *, row_number() OVER (ORDER BY
    log_weight - ln(-ln(
      (('0x' || substr(md5('dsir7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1.0)
      / 1152921504606846976.0)) DESC,
    doc_id ASC) AS rn
  FROM wd) x
WHERE rn <= 50
""",
    # r7 temperature sampling: alpha=0.5 shares, largest-remainder
    # allocation (9dp-rounded ideal before floor on BOTH engines)
    "e8_temperature_sample": """
WITH counts AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
ws AS (SELECT sum(pow(c, 0.5)) AS wsum FROM counts),
shares AS (
  SELECT lang, c,
         CAST(floor(round(100.0 * pow(c, 0.5) / wsum, 9)) AS BIGINT) AS base,
         round(100.0 * pow(c, 0.5) / wsum, 9)
           - floor(round(100.0 * pow(c, 0.5) / wsum, 9)) AS rem
  FROM counts CROSS JOIN ws
),
lft AS (SELECT 100 - sum(base) AS lft FROM shares),
quota AS (
  SELECT lang,
         least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang ASC)
                                <= lft THEN 1 ELSE 0 END,
               c) AS q
  FROM shares CROSS JOIN lft
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5('t7|' || CAST(doc_id AS VARCHAR)) ASC,
                    doc_id ASC) AS rn
  FROM documents
)
SELECT r.doc_id, r.lang FROM ranked r JOIN quota USING (lang) WHERE r.rn <= q
""",
    "e8_cap_per_group": """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5('cap1|' || CAST(doc_id AS VARCHAR)) ASC,
                    doc_id ASC) AS rn
  FROM documents
) t WHERE rn <= 50
""",
    # leakage-safe split: e7's transitive-closure clusters, split
    # assigned through the CLUSTER id with the e8_hash_split interval
    # layout (cumulative thresholds in sorted split-name order)
    "e8b_leakage_safe_split": (
        lambda names, edges: f"""
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
)
SELECT doc_id, cluster_id,
       CASE
         WHEN md5('lsafe|' || CAST(cluster_id AS VARCHAR)) < '{edges[0]}'
           THEN '{names[0]}'
         WHEN md5('lsafe|' || CAST(cluster_id AS VARCHAR)) < '{edges[1]}'
           THEN '{names[1]}'
         ELSE '{names[2]}'
       END AS split
FROM comp
"""
    )(
        sorted(SPLIT_FRACTIONS),
        [
            rate_threshold(sorted(SPLIT_FRACTIONS.items())[0][1]),
            rate_threshold(
                sorted(SPLIT_FRACTIONS.items())[0][1]
                + sorted(SPLIT_FRACTIONS.items())[1][1]
            ),
        ],
    ),
    "e8_pack_sequences": f"""
WITH d AS (
  SELECT doc_id, CAST(len({TOKS_SQL}) AS INT) AS n_tokens,
         md5('{PACK_SEED}|' || CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS strt
  FROM d
)
SELECT doc_id, n_tokens,
       strt // {PACK_SEQ_LEN} AS pack_id,
       strt % {PACK_SEQ_LEN} AS pack_offset
FROM s
""",
    "e8_pack_materialize": f"""
WITH d AS (
  SELECT doc_id, {TOKS_SQL} AS toks,
         md5('{PACK_SEED}|' || CAST(doc_id AS VARCHAR)) AS hk
  FROM documents
),
d2 AS (
  SELECT doc_id, toks, hk, CAST(len(toks) AS BIGINT) AS n
  FROM d WHERE len(toks) > 0
),
s AS (
  SELECT toks, n,
         CAST(coalesce(sum(n) OVER (
           ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS strt
  FROM d2
),
p AS (
  SELECT u.pack AS pack_id,
         greatest(strt - u.pack * {PACK_SEQ_LEN}, 0) AS pos,
         list_slice(
           toks,
           greatest(u.pack * {PACK_SEQ_LEN} - strt, 0) + 1,
           least((u.pack + 1) * {PACK_SEQ_LEN}, strt + n) - strt
         ) AS piece
  FROM s, unnest(generate_series(
           strt // {PACK_SEQ_LEN}, (strt + n - 1) // {PACK_SEQ_LEN}
         )) AS u(pack)
)
SELECT pack_id,
       CAST(sum(len(piece)) AS BIGINT) AS n_tokens,
       string_agg(array_to_string(piece, ' '), ' ' ORDER BY pos) AS pack_text
FROM p GROUP BY pack_id
""",
}

ORACLE_SQL["e8_budget_sample"] = f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY lang
           ORDER BY md5('{BUDGET_SEED}|' || CAST(doc_id AS VARCHAR)), doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM documents
)
SELECT doc_id, lang, n_chars FROM ranked
WHERE cum <= CASE lang
               WHEN 'de' THEN {BUDGETS["de"]}
               WHEN 'en' THEN {BUDGETS["en"]}
               ELSE 0
             END
"""
