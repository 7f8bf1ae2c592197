"""The Dolma-style batch ingest pipeline (r9 verdict task 9): the
full pretraining-data preparation flow as ONE lazy plan — exact
collapse + MinHash dedup -> Gopher rule battery -> LM quality gate ->
Bloom n-gram decontamination -> semantic (embedding) decontamination
-> temperature-scaled language sampling -> sequence packing — with a
composed CTE oracle that chains the same eight stage programs. The
streaming twin is ``streaming.stream_ingest_pipeline``; the funnel
audit twin (run_with_audit over the same stages ≡ independent counts)
lives in tests/test_ingest_batch.py.

Stage semantics (each individually oracled by its own registry row):
* dedup: ``dedup_keep_collapsed`` + md5km MinHash LSH at 0.7/8 bands
  — identical kept set to e7b_minhash_dedup_keep (exact-collapse
  staging is provably keep-set-preserving for min-id selection).
* Gopher: the e4_gopher_rules battery at min_words=15.
* LM: mean unigram ln-probability under the RAW-corpus model (the
  materialized-model ingest shape; threshold on the 6dp-rounded
  score, engine-portable).
* Bloom: e9_bloom_decontam's bitset (deterministic FPs given md5 and
  m/k) against the %7==0 benchmark docs — benchmark members drop on
  their own 1.0 self-containment.
* semantic: e9c's argmax-cosine against the %7==0 benchmark
  embeddings (replica-0-pinned like e9c; embeddings share the
  documents id space).
* sampling: mT5-style temperature allocation (alpha=0.5) over the
  SURVIVING language mix — quotas depend on the pipeline state, which
  is why this is a composition test, not eight independent rows.
* packing: concat-and-chunk layout at PACK_SEQ_LEN.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    BLOOM_T,
    DECON_N,
    F,
    PACK_SEQ_LEN,
    QUALITY_STOPWORDS,
    TOKS_SQL,
    _BLOOM_K,
    _BLOOM_M,
    _KM_BAND_KEYS,
    _KM_HASHES,
    _KM_SIG_AGGS,
    _MH_AGREE,
    _MH_BANDS,
    _MH_N,
    _cos_sql,
    _docs,
    _emb,
    _sqllist,
)

INGEST_LM_T = -3.41        # drops the ~10% mean-logprob tail at sf0.01
INGEST_BUDGET = 200        # temperature-sampling doc budget
INGEST_SEED = "ing9"       # sampling hash seed
INGEST_PACK_SEED = "ing9p"  # packing layout seed


def ingest_stages(
    spark,
    sf_dir,
    checkpoint_mode: str = "local",
    barrier_mode: str = "rows",
):
    """The pipeline as ordered ``(name, DataFrame -> DataFrame)``
    stages over ``documents`` — shared by the gate query (composed
    into one plan) and the ``run_with_audit`` funnel test.

    ``checkpoint_mode`` (r10, mirroring
    ``clustering.connected_components``): the two materialization
    barriers below — and the CC rounds inside the dedup stage — use
    executor-local blocks under ``'local'`` (fastest, dies with an
    executor) or the session checkpoint dir under ``'reliable'``
    (requires ``setCheckpointDir``; the right switch for a multi-hour
    100 TB ingest where one preemption must not restart the whole
    pipeline — production Dolma-style runs materialize intermediate
    shards between phases for exactly this reason).

    ``barrier_mode`` (r11, r10 verdict task 9 — the documented
    SCALING_r10 lever): ``'rows'`` checkpoints the surviving rows
    INCLUDING the raw text (~0.5 GB materialized at sf10p);
    ``'ids'`` checkpoints only the kept id set and re-derives the
    rows by joining the raw parquet scan back — the barrier then
    stores 8 bytes/doc instead of the text, at the price of one extra
    scan + join per barrier. Both modes produce the identical
    manifest (pinned in tests/test_ingest_batch.py); the sf10p A/B
    (SCALING_r11.md) records which wins at scale."""
    if checkpoint_mode not in ("local", "reliable"):
        raise ValueError(
            f"checkpoint_mode must be 'local' or 'reliable', got "
            f"{checkpoint_mode!r}"
        )
    if barrier_mode not in ("rows", "ids"):
        raise ValueError(
            f"barrier_mode must be 'rows' or 'ids', got {barrier_mode!r}"
        )

    def _checkpoint(df):
        if checkpoint_mode == "reliable":
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def barrier(df):
        if barrier_mode == "ids":
            # both barriered stages are keep-type filters over raw
            # document rows, so the kept-id set re-derives them from
            # the (column-pruned, pushdown-eligible) scan exactly
            kept = _checkpoint(df.select("doc_id"))
            return _docs(spark, sf_dir).join(kept, "doc_id")
        return _checkpoint(df)

    from decision_tree_stuff_spark.operators.clustering import (
        dedup_keep_collapsed,
    )
    from decision_tree_stuff_spark.operators.decontam import (
        bloom_decontaminate,
        embedding_decontamination,
    )
    from decision_tree_stuff_spark.operators.dedup import minhash_lsh_pairs
    from decision_tree_stuff_spark.operators.sampling import (
        pack_sequences,
        temperature_sample,
    )
    from decision_tree_stuff_spark.operators.textstats import (
        gopher_rules,
        unigram_logprob,
        unigram_model,
    )
    from decision_tree_stuff_spark.functions.text import token_count

    docs = _docs(spark, sf_dir)
    bench_docs = docs.where("doc_id % 7 = 0")
    emb = _emb(spark, sf_dir)
    bench_emb = emb.where("vec_id % 7 = 0 AND vec_id < 10000000")

    def dedup(d):
        out = dedup_keep_collapsed(
            d,
            lambda reps: minhash_lsh_pairs(
                reps, bands=8, threshold=0.7, hash_fn="md5km"
            ),
            checkpoint_mode=checkpoint_mode,
        )
        # barrier (see bloom below): gopher joins its keep set back
        # onto its input, so the LSH+CC pipeline would execute twice
        return barrier(out)

    def gopher(d):
        keep = gopher_rules(d, min_words=15).where("keep").select("doc_id")
        return d.join(keep, "doc_id")

    def lm_gate(d):
        # model built on the RAW corpus (per-doc scores are
        # corpus-level), but ONLY the survivor set is exploded and
        # vocab-joined for scoring (r10 verdict task 5): survivors are
        # a subset of the model corpus, so every token is
        # in-vocabulary and the scores are identical to scoring the
        # full corpus — exploding already-dropped docs through the
        # model join was avoidable work at 100 TB (the model build
        # itself still needs, and gets, the one full-corpus scan).
        scored = unigram_logprob(
            d, model=unigram_model(_docs(spark, sf_dir))
        ).where(F.col("mean_logprob") >= INGEST_LM_T)
        return d.join(scored.select("doc_id"), "doc_id")

    def bloom(d):
        out = bloom_decontaminate(
            d, bench_docs, n=DECON_N, threshold=BLOOM_T
        )
        # MATERIALIZATION BARRIER (r9): the stages downstream of here
        # each reference their input twice in one plan (semantic: the
        # flag derivation AND the anti-join stream; sampling: the
        # group-count aggregate AND the ranked window) — without a
        # barrier the whole dedup->gopher->lm->bloom prefix re-executes
        # 4-6x inside the single action (measured 44 s -> barrier
        # here cuts it to the once-through cost). Production pipelines
        # materialize between ingest phases anyway (Dolma writes
        # intermediate shards); the CC stage already runs build-time
        # jobs, so the row was never a literally-lazy plan.
        return barrier(out)

    def semantic(d):
        flagged = (
            embedding_decontamination(
                emb.join(d.select(F.col("doc_id").alias("vec_id")), "vec_id"),
                bench_emb,
                threshold=0.8,
                exact=True,
            )
            .where("contaminated")
            .select(F.col("vec_id").alias("doc_id"))
        )
        return d.join(flagged, "doc_id", "left_anti")

    def sample(d):
        return temperature_sample(
            d.select("doc_id", "lang", "text"),
            "lang",
            total_n=INGEST_BUDGET,
            alpha=0.5,
            key_cols=["doc_id"],
            seed=INGEST_SEED,
        )

    def pack(d):
        return pack_sequences(
            d.select(
                "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
            ),
            "n_tokens",
            PACK_SEQ_LEN,
            ["doc_id"],
            seed=INGEST_PACK_SEED,
        )

    return [
        ("dedup", dedup),
        ("gopher", gopher),
        ("lm_gate", lm_gate),
        ("bloom_decontam", bloom),
        ("semantic_decontam", semantic),
        ("temperature_sample", sample),
        ("pack", pack),
    ]


def q_e12_batch_ingest(spark, sf_dir):
    """The composed batch ingest (see module doc): one lazy plan from
    raw ``documents`` to packed-sequence layout. Returns
    (doc_id, lang, n_tokens, pack_id, pack_offset) for every sampled
    doc — the training-data manifest."""
    from decision_tree_stuff_spark.utils import keepalive

    docs = _docs(spark, sf_dir)
    out = docs
    stage_frames = []
    for _, fn in ingest_stages(spark, sf_dir):
        out = fn(out)
        # the rebinding drops each stage's Python wrapper; pin them to
        # the final frame so caches tied to a stage result's lifetime
        # (temperature_sample's quota counts) survive until execution
        stage_frames.append(out)
    return keepalive(
        out.select("doc_id", "lang", "n_tokens", "pack_id", "pack_offset"),
        *stage_frames,
    )


ORACLE_SQL: Dict[str, str] = {}

ORACLE_SQL["e12_batch_ingest"] = f"""
WITH RECURSIVE toks AS (
  SELECT DISTINCT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
km AS ({_KM_HASHES}),
sig AS MATERIALIZED (
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
s2 AS MATERIALIZED (
  SELECT d.* FROM documents d
  JOIN (SELECT node AS doc_id FROM reach GROUP BY node HAVING min(lab) = node)
  USING (doc_id)
),
gstats AS (
  SELECT doc_id,
    len(gtoks) AS n_words,
    round(length(array_to_string(gtoks, ''))
          / CAST(greatest(len(gtoks), 1) AS DOUBLE), 6) AS mean_word_len,
    round(((length(raw) - length(replace(raw, '#', '')))
           + (length(raw) - length(replace(raw, '...', ''))) / 3)
          / CAST(greatest(len(gtoks), 1) AS DOUBLE), 6) AS symbol_word_ratio,
    round(len(list_filter(gtoks, t -> regexp_matches(t, '[a-z]')))
          / CAST(greatest(len(gtoks), 1) AS DOUBLE), 6) AS alpha_word_frac,
    len(list_filter(gtoks, t -> list_contains({_sqllist(QUALITY_STOPWORDS)}, t)))
      AS stop_hits,
    round(len(list_filter(lines, l -> ends_with(l, '...')))
          / CAST(greatest(len(lines), 1) AS DOUBLE), 6) AS ellipsis_line_frac,
    round(len(list_filter(lines, l -> starts_with(l, '-')
                                      OR starts_with(l, '*')))
          / CAST(greatest(len(lines), 1) AS DOUBLE), 6) AS bullet_line_frac
  FROM (
    SELECT doc_id, text AS raw,
           list_filter({TOKS_SQL}, t -> t <> '') AS gtoks,
           list_filter(list_transform(string_split(text, chr(10)),
                                      l -> trim(l)), l -> l <> '') AS lines
    FROM s2) b
),
s3 AS MATERIALIZED (
  SELECT s2.* FROM s2 JOIN gstats USING (doc_id)
  WHERE n_words BETWEEN 15 AND 100000
    AND mean_word_len BETWEEN 2.0 AND 10.0
    AND symbol_word_ratio <= 0.1
    AND alpha_word_frac >= 0.8
    AND stop_hits >= 2
    AND ellipsis_line_frac <= 0.3 AND bullet_line_frac <= 0.9
),
occ AS MATERIALIZED (
  SELECT doc_id, tok AS token FROM (
    SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
  ) u WHERE tok <> ''
),
model AS MATERIALIZED (
  SELECT token, ln(CAST(count(*) AS DOUBLE)
                   / (SELECT count(*) FROM occ)) AS lp
  FROM occ GROUP BY 1
),
lmscored AS MATERIALIZED (
  SELECT doc_id, round(avg(lp), 6) AS mean_logprob
  FROM occ JOIN model USING (token) GROUP BY 1
),
s4 AS MATERIALIZED (
  SELECT s3.* FROM s3 JOIN lmscored USING (doc_id)
  WHERE mean_logprob >= {INGEST_LM_T}
),
allgrams AS MATERIALIZED (
  SELECT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(gtoks) - {DECON_N} + 2, 1)),
             i -> array_to_string(gtoks[i:i + {DECON_N} - 1], ' '))) AS gram
    FROM (SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS gtoks
          FROM documents) d
  ) g GROUP BY 1, 2
),
ii AS (SELECT unnest(range(0, {_BLOOM_K})) AS i),
bpos AS (
  SELECT DISTINCT
    (('0x' || substr(md5(gram), 1, 15))::BIGINT
     + ii.i * ('0x' || substr(md5(gram), 17, 15))::BIGINT) % {_BLOOM_M} AS pos
  FROM (SELECT DISTINCT gram FROM allgrams WHERE doc_id % 7 = 0) bg, ii
),
tpos AS (
  SELECT g.doc_id, g.gram,
    (('0x' || substr(md5(g.gram), 1, 15))::BIGINT
     + ii.i * ('0x' || substr(md5(g.gram), 17, 15))::BIGINT) % {_BLOOM_M} AS pos
  FROM allgrams g JOIN s4 USING (doc_id), ii
),
gramhit AS (
  SELECT t.doc_id, t.gram, count(b.pos) = {_BLOOM_K} AS hit
  FROM tpos t LEFT JOIN bpos b ON t.pos = b.pos
  GROUP BY 1, 2
),
bloomagg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM gramhit GROUP BY 1
),
s5 AS MATERIALIZED (
  SELECT s4.* FROM s4 LEFT JOIN bloomagg USING (doc_id)
  WHERE n_grams IS NULL OR n_grams = 0
     OR round(n_hit / CAST(n_grams AS DOUBLE), 6) < {BLOOM_T}
),
bemb AS (
  SELECT vec_id AS bid, embedding AS bvec FROM embeddings
  WHERE vec_id % 7 = 0 AND vec_id < 10000000
),
cemb AS (
  SELECT e.vec_id, e.embedding FROM embeddings e JOIN s5 ON e.vec_id = s5.doc_id
),
semscore AS (
  SELECT vec_id, cos FROM (
    SELECT c.vec_id, round({_cos_sql('c.embedding', 'b.bvec')}, 6) AS cos,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY round({_cos_sql('c.embedding', 'b.bvec')}, 6) DESC,
                      b.bid ASC) AS rn
    FROM cemb c CROSS JOIN bemb b) t
  WHERE rn = 1
),
s6 AS MATERIALIZED (
  SELECT s5.* FROM s5 LEFT JOIN semscore ON s5.doc_id = semscore.vec_id
  WHERE NOT coalesce(cos >= 0.8, false)
),
counts AS (SELECT lang, count(*) AS c FROM s6 GROUP BY 1),
ws AS (SELECT sum(pow(c, 0.5)) AS wsum FROM counts),
shares AS (
  SELECT lang, c,
         CAST(floor(round({INGEST_BUDGET}.0 * pow(c, 0.5) / wsum, 9)) AS BIGINT)
           AS base,
         round({INGEST_BUDGET}.0 * pow(c, 0.5) / wsum, 9)
           - floor(round({INGEST_BUDGET}.0 * pow(c, 0.5) / wsum, 9)) AS rem
  FROM counts CROSS JOIN ws
),
lft AS (SELECT {INGEST_BUDGET} - sum(base) AS lft FROM shares),
quota AS (
  SELECT lang,
         least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang ASC)
                                <= lft THEN 1 ELSE 0 END,
               c) AS q
  FROM shares CROSS JOIN lft
),
ranked AS (
  SELECT doc_id, lang, text,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5('{INGEST_SEED}|' || CAST(doc_id AS VARCHAR)) ASC,
                    doc_id ASC) AS rn
  FROM s6
),
s7 AS (
  SELECT doc_id, lang, text FROM ranked JOIN quota USING (lang) WHERE rn <= q
),
pd AS (
  SELECT doc_id, lang, CAST(len({TOKS_SQL}) AS INT) AS n_tokens,
         md5('{INGEST_PACK_SEED}|' || CAST(doc_id AS VARCHAR)) AS hk
  FROM s7
),
ps AS (
  SELECT doc_id, lang, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS strt
  FROM pd
)
SELECT doc_id, lang, n_tokens,
       strt // {PACK_SEQ_LEN} AS pack_id,
       strt % {PACK_SEQ_LEN} AS pack_offset
FROM ps
"""
