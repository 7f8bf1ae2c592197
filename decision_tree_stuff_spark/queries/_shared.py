"""The driver-facing query matrix: every implemented operator from
SURVEY.md §2 as a ``(spark, sf_dir) -> DataFrame`` builder, paired
with an exact DuckDB-SQL oracle (``ORACLE_SQL``) where the operator is
ANSI-expressible.

Float-parity rules (both sides, always):
* probabilities / averages / ratios / cosines → ROUND(x, 6)
* large-magnitude sums (prices) → ROUND(x, 2)
* counts stay exact integers; timestamps are epoch-second BIGINTs
* rank/limit decisions use deterministic secondary keys so both
  engines select the same rows before hashing.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from decision_tree_stuff_spark.dtree import DecisionNode, DecisionTree, DecisionTreeParams
from decision_tree_stuff_spark.functions.text import (
    LANG_STOPWORDS,
    LANGS,
    QUALITY_STOPWORDS,
    fingerprint,
)
from decision_tree_stuff_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from decision_tree_stuff_spark.operators.sessionize import (
    sessionize,
    sliding_counts,
    tumbling_counts,
)
from decision_tree_stuff_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    sign_lsh_topk,
)
from decision_tree_stuff_spark.operators.sampling import rate_threshold
from decision_tree_stuff_spark.operators.zorder import zorder_sql
from decision_tree_stuff_spark.operators.zorder import hilbert_sql
from decision_tree_stuff_spark.operators.textstats import document_stats, tf_idf
from decision_tree_stuff_spark.splitting import SplitParams, compute_all_splits

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------
# Shared fragments
# ---------------------------------------------------------------------

FEATURES = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
FEATURES_SMALL = ["l_discount", "l_quantity"]
QUERY_IDS = list(range(10))

# Derived binary label on lineitem (FIXTURES.md F-4).
BASE_SQL = """base AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         CAST(l_discount > 0.05 AS BIGINT) AS class
  FROM lineitem
)"""

MELT_SQL = "melt AS (\n  " + "\n  UNION ALL ".join(
    f"SELECT class, '{f}' AS variable, {f} AS value FROM base" for f in FEATURES
) + "\n)"

MELT_IDS_SQL = "melt AS (\n  " + "\n  UNION ALL ".join(
    f"SELECT l_orderkey, l_linenumber, '{f}' AS variable, {f} AS value FROM lineitem"
    for f in FEATURES_SMALL
) + "\n)"

# Normalized whitespace tokens of a text column (DuckDB side).
TOKS_SQL = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"

# Shared blocked-Jaccard pair-graph CTE fragment (threshold 0.8,
# lang+len_bucket blocks) — the same pair set the e7 family twins
# inline; MATERIALIZED because the graph twins reference `jp` from
# several unrolled iterations (DuckDB inlines multi-referenced CTEs
# otherwise — the 1800× BPE lesson, ROUND7_NOTES.md).
PAIR_GRAPH_SQL = """toks AS MATERIALIZED (
  SELECT DISTINCT doc_id, lang, len_bucket, tok AS token FROM (
    SELECT doc_id, lang, n_chars // 100 AS len_bucket,
           unnest({toks}) AS tok
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
jp AS MATERIALIZED (
  SELECT id_a, id_b
  FROM pc
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) >= 0.8
)"""


def _h_sql(p: str) -> str:
    """Binary entropy H(p) with the degenerate p∈{0,1} → 0 (matches
    EntropySplitMetric.eval_from_p1_expr's NULL/NaN → 0)."""
    return (
        f"CASE WHEN ({p}) <= 0.0 OR ({p}) >= 1.0 THEN 0.0 "
        f"ELSE -(1.0-({p}))*log2(1.0-({p})) - ({p})*log2({p}) END"
    )


def _step_sql(d: str, p: str, feats: list = None) -> str:
    """One routing step: append L/R per alias ``d``'s decision for the
    row's current path ``{p}``, or keep the path if the node is a
    leaf (LEFT JOIN miss)."""
    case_var = (
        f"CASE {d}.variable "
        + " ".join(f"WHEN '{f}' THEN r.{f}" for f in (feats or FEATURES))
        + " END"
    )
    return (
        f"CASE WHEN {d}.p IS NULL THEN r.{p} ELSE r.{p} || "
        f"(CASE WHEN ({case_var}) <= {d}.thr THEN 'L' ELSE 'R' END) END"
    )


def _tree_train_cte(pfx: str, train_where: str, depth: int = 3,
                    thr_sql: str = "AVG(value)",
                    metric_name: str = "entropy") -> str:
    """Level-wise CTE derivation of the FIXED gate-config decision tree
    (``max_depth=depth``, no prune; splitter via ``thr_sql`` — the
    per-(path, variable) threshold aggregate, default mean; impurity
    via ``metric_name`` ∈ {entropy, gini}) — the DuckDB twin of
    ``DecisionTree.fit`` for a FIXED hyperparameter configuration
    (dtree.py:368-480), one grouped computation per depth instead of
    one CTE per node. Q-4 is encoded: the node STOP gate is always
    the entropy of the node's p1, regardless of the split metric:

    * ``{pfx}r{k}``  — training rows with their depth-k node path
      (``p``: \'\' at the root, then \'L\'/\'R\' appended per split).
    * ``{pfx}t{k}/g{k}`` — per (path, variable): mean threshold, then
      conditional (left/right p1 with the Q-2 null→0 impute, counts)
      — the o05/o06 program generalized with a path group key.
    * ``{pfx}d{k}``  — the split DECISIONS: best (metric ASC, variable
      ASC — Q-3 deterministic tie-break) per path, kept only where the
      node actually splits: node entropy > 0 (the ``root_entropy ==
      0.0`` stop; the >=0 entropy/sample gates are vacuous at the gate
      config\'s defaults) and both sides non-empty (Q-2 guard). Depth
      ``!= max_depth`` is the unrolling itself.
    * ``{pfx}leaf`` — per-leaf majority over TRAINING rows (tie → 0,
      matching ``_majority_from_stats``).

    CTEs are MATERIALIZED: each level references its parent ~6 times,
    and DuckDB\'s default inlining re-evaluates the whole chain per
    reference — exponential in depth (observed OOM on the 3-tree
    forest stack).
    """
    feats = FEATURES
    fcols = ", ".join(feats)
    rcols = ", ".join(f"r.{f}" for f in feats)
    step = _step_sql("d", "p")
    ctes = [
        f"{pfx}r0 AS MATERIALIZED "
        f"(SELECT {fcols}, class, '' AS p FROM base{train_where})",
    ]
    for k in range(depth):
        melt = "\n    UNION ALL ".join(
            f"SELECT p, '{f}' AS variable, {f} AS value, class FROM {pfx}r{k}"
            for f in feats
        )
        if metric_name == "entropy":
            metric = f"({_h_sql('g.lp')}) + ({_h_sql('g.rp')})"
        elif metric_name == "gini":
            metric = (
                "(1.0 - (1.0-g.lp)*(1.0-g.lp) - g.lp*g.lp)"
                " + (1.0 - (1.0-g.rp)*(1.0-g.rp) - g.rp*g.rp)"
            )
        else:
            raise ValueError(f"unknown metric {metric_name!r}")
        ctes += [
            f"{pfx}m{k} AS MATERIALIZED (\n    {melt}\n)",
            f"{pfx}t{k} AS MATERIALIZED (SELECT p, variable, {thr_sql} AS thr "
            f"FROM {pfx}m{k} GROUP BY 1, 2)",
            f"""{pfx}g{k} AS MATERIALIZED (
  SELECT m.p, m.variable, t.thr,
         COALESCE(AVG(CASE WHEN m.value <= t.thr THEN m.class END), 0.0) AS lp,
         COALESCE(AVG(CASE WHEN m.value >  t.thr THEN m.class END), 0.0) AS rp,
         COUNT(CASE WHEN m.value <= t.thr THEN 1 END) AS ln_,
         COUNT(CASE WHEN m.value >  t.thr THEN 1 END) AS rn_
  FROM {pfx}m{k} m JOIN {pfx}t{k} t ON m.p = t.p AND m.variable = t.variable
  GROUP BY 1, 2, 3
)""",
            f"{pfx}n{k} AS MATERIALIZED "
            f"(SELECT p, AVG(class) AS p1 FROM {pfx}r{k} GROUP BY 1)",
            f"""{pfx}d{k} AS MATERIALIZED (
  SELECT s.p, s.variable, s.thr FROM (
    SELECT g.p, g.variable, g.thr, g.ln_, g.rn_,
           ROW_NUMBER() OVER (PARTITION BY g.p
                              ORDER BY {metric} ASC, g.variable ASC) AS rnk
    FROM {pfx}g{k} g) s
  JOIN {pfx}n{k} n ON s.p = n.p
  WHERE s.rnk = 1 AND ({_h_sql('n.p1')}) > 0.0 AND least(s.ln_, s.rn_) > 0
)""",
            f"""{pfx}r{k + 1} AS MATERIALIZED (
  SELECT {rcols}, r.class, {step} AS p
  FROM {pfx}r{k} r LEFT JOIN {pfx}d{k} d ON r.p = d.p
)""",
        ]
    ctes.append(
        f"{pfx}leaf AS MATERIALIZED (SELECT p, CASE WHEN 2*SUM(class) > "
        f"COUNT(*) THEN 1 ELSE 0 END AS pred FROM {pfx}r{depth} GROUP BY 1)"
    )
    return ",\n".join(ctes)


RFEATURES = ["l_extendedprice", "l_quantity", "l_tax"]


RTREE_KEYS = ["l_orderkey", "l_linenumber"]


def _rtree_cte_sql(
    pfx: str,
    depth: int = 2,
    src: str = "base",
    y_sql: str = "l_discount",
    extra_cols: list = None,
) -> str:
    """Level-wise CTE derivation of the FIXED-config CART regression
    tree (operators/regression_tree.py) — the variance-reduction
    analog of ``_tree_train_cte``: per (path, variable) the mean
    threshold, then the mergeable (count, sum, sum-of-squares) triple
    per side; score = SSE_l + SSE_r in the identical ``q - s*s/n``
    double shape; best per path on (score, variable) ASC; a node
    splits only when it is impure (exact MIN(y) <> MAX(y)), has >= 2
    rows, and both sides are non-empty. Leaves predict
    round(AVG(y), 6) — half-away, matching the driver-side
    ``_round_away``. CTEs MATERIALIZED for the same
    exponential-inlining reason as the classification twins.

    The row keys (and any ``extra_cols``, e.g. a boosting stage's
    running prediction) RIDE THROUGH the train chain, so
    ``{pfx}r{depth}`` doubles as the routed transform — join it with
    ``{pfx}leaf`` on ``p`` for per-row predictions. ``y_sql`` is the
    training target expression over ``src`` (a residual for boosting
    stages)."""
    feats = RFEATURES
    extra = list(extra_cols or [])
    carry = RTREE_KEYS + extra
    ccols = ", ".join(carry)
    fcols = ", ".join(feats)
    rcols = ", ".join(
        [f"r.{c}" for c in carry] + [f"r.{f}" for f in feats]
    )

    def sse(n: str, s: str, q: str) -> str:
        return f"(CASE WHEN {n} > 0 THEN {q} - {s}*{s}/{n} ELSE 0.0 END)"

    ctes = [
        f"{pfx}r0 AS MATERIALIZED (SELECT {ccols}, {fcols}, "
        f"({y_sql}) AS ty, '' AS p FROM {src})",
    ]
    for k in range(depth):
        melt = "\n    UNION ALL ".join(
            f"SELECT p, '{f}' AS variable, {f} AS value, ty FROM {pfx}r{k}"
            for f in feats
        )
        score = (
            sse("g.ln_", "g.ls_", "g.lq_")
            + " + "
            + sse("g.rn_", "g.rs_", "g.rq_")
        )
        step = _step_sql("d", "p", feats)
        ctes += [
            f"{pfx}m{k} AS MATERIALIZED (\n    {melt}\n)",
            f"{pfx}t{k} AS MATERIALIZED (SELECT p, variable, "
            f"AVG(value) AS thr FROM {pfx}m{k} GROUP BY 1, 2)",
            f"""{pfx}g{k} AS MATERIALIZED (
  SELECT m.p, m.variable, t.thr,
         COUNT(CASE WHEN m.value <= t.thr THEN 1 END) AS ln_,
         COALESCE(SUM(CASE WHEN m.value <= t.thr THEN m.ty END), 0.0) AS ls_,
         COALESCE(SUM(CASE WHEN m.value <= t.thr THEN m.ty*m.ty END), 0.0) AS lq_,
         COUNT(CASE WHEN m.value > t.thr THEN 1 END) AS rn_,
         COALESCE(SUM(CASE WHEN m.value > t.thr THEN m.ty END), 0.0) AS rs_,
         COALESCE(SUM(CASE WHEN m.value > t.thr THEN m.ty*m.ty END), 0.0) AS rq_
  FROM {pfx}m{k} m JOIN {pfx}t{k} t ON m.p = t.p AND m.variable = t.variable
  GROUP BY 1, 2, 3
)""",
            f"{pfx}n{k} AS MATERIALIZED (SELECT p, COUNT(*) AS n, "
            f"MIN(ty) AS lo, MAX(ty) AS hi FROM {pfx}r{k} GROUP BY 1)",
            f"""{pfx}d{k} AS MATERIALIZED (
  SELECT s.p, s.variable, s.thr FROM (
    SELECT g.p, g.variable, g.thr, g.ln_, g.rn_,
           ROW_NUMBER() OVER (PARTITION BY g.p
                              ORDER BY {score} ASC, g.variable ASC) AS rnk
    FROM {pfx}g{k} g) s
  JOIN {pfx}n{k} n ON s.p = n.p
  WHERE s.rnk = 1 AND n.lo <> n.hi AND n.n >= 2
    AND least(s.ln_, s.rn_) > 0
)""",
            f"""{pfx}r{k + 1} AS MATERIALIZED (
  SELECT {rcols}, r.ty, {step} AS p
  FROM {pfx}r{k} r LEFT JOIN {pfx}d{k} d ON r.p = d.p
)""",
        ]
    ctes.append(
        f"{pfx}leaf AS MATERIALIZED (SELECT p, round(AVG(ty), 6) AS pred "
        f"FROM {pfx}r{depth} GROUP BY 1)"
    )
    return ",\n".join(ctes)


def _gbt_cte_sql(n_trees: int = 3, depth: int = 2,
                 lr: float = 0.5) -> str:
    """Unrolled gradient-boosting chain (Friedman 2001, squared
    error): stage 0 predicts round(AVG(y), 6); each stage m trains
    the FIXED-config regression tree on the residual ``y - fhat`` via
    ``_rtree_cte_sql`` (keys + running prediction riding through its
    train chain), then advances ``fhat += lr * leaf.pred``. The
    addition order matches the Spark expression exactly
    (left-associated), so doubles agree bit-for-bit before the final
    6dp round."""
    parts = [
        """gb0 AS MATERIALIZED (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_tax,
         l_discount AS y,
         (SELECT round(AVG(l_discount), 6) FROM base) AS fhat
  FROM base
)"""
    ]
    for m in range(n_trees):
        pfx = f"g{m}_"
        parts.append(
            _rtree_cte_sql(
                pfx,
                depth=depth,
                src=f"gb{m}",
                y_sql="y - fhat",
                extra_cols=["y", "fhat"],
            )
        )
        parts.append(
            f"""gb{m + 1} AS MATERIALIZED (
  SELECT r.l_orderkey, r.l_linenumber, r.l_extendedprice, r.l_quantity,
         r.l_tax, r.y AS y, r.fhat + {lr!r} * l.pred AS fhat
  FROM {pfx}r{depth} r JOIN {pfx}leaf l ON r.p = l.p
)"""
        )
    return ",\n".join(parts)


def _apply_cte(pfxs: list, depth: int = 3) -> str:
    """Route EVERY base row (keys carried) through one or more trained
    trees\' decision tables in a single stack — the ``transform``.
    One path column per tree: lineitem\'s (l_orderkey, l_linenumber)
    is NOT unique in the synthetic data, so per-tree outputs cannot be
    re-joined on keys afterwards without fan-out; routing all trees
    row-locally sidesteps key identity entirely (exactly like the
    Spark side, where the vote is one projection)."""
    feats = FEATURES
    fcols = ", ".join(feats)
    rcols = ", ".join(f"r.{f}" for f in feats)
    paths = [f"p{i}" for i in range(len(pfxs))]
    ctes = [
        "ap0 AS MATERIALIZED (SELECT l_orderkey, l_linenumber, "
        + fcols
        + ", "
        + ", ".join(f"'' AS {p}" for p in paths)
        + " FROM base)"
    ]
    for k in range(depth):
        steps = ", ".join(
            f"{_step_sql(f'd{i}', p)} AS {p}" for i, p in enumerate(paths)
        )
        joins = "\n  ".join(
            f"LEFT JOIN {pfx}d{k} d{i} ON r.{p} = d{i}.p"
            for i, (pfx, p) in enumerate(zip(pfxs, paths))
        )
        ctes.append(
            f"""ap{k + 1} AS MATERIALIZED (
  SELECT r.l_orderkey, r.l_linenumber, {rcols}, {steps}
  FROM ap{k} r
  {joins}
)"""
        )
    return ",\n".join(ctes)


def _bag_where_sql(seed: str, rate: float) -> str:
    """The deterministic_sample filter (sampling.py:65-71) DuckDB-side:
    md5 over the same '|'-joined key casts, same embedded threshold
    literal. Double→string cast formatting matches Spark's (verified:
    identical digest min/max across engines on the gate data)."""
    cast_cols = ", ".join(f"CAST({f} AS VARCHAR)" for f in FEATURES)
    return (
        f" WHERE md5(concat_ws('|', '{seed}', {cast_cols}))"
        f" < '{rate_threshold(rate)}'"
    )


def _cos_sql(a: str, b: str) -> str:
    """Cosine in explicit double math — element order and double
    promotion match functions.array_math.cosine_similarity exactly."""
    def dot(x: str, y: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({x}, {y}), "
            f"x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)))"
        )
    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def _l2_sql(a: str, b: str) -> str:
    """Squared L2 in explicit double math — matches the zip_with
    (x-y)*(x-y) aggregate in operators.similarity._sub_l2."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> (CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))"
        f"*(CAST(x[1] AS DOUBLE)-CAST(x[2] AS DOUBLE))))"
    )


def _kmeans_cte_sql(k: int, iters: int, d: int) -> str:
    """Unrolled-CTE DuckDB twin of similarity.kmeans_fit/assign: the
    same trick as the tree-fit twin — a FIXED configuration makes the
    iterative algorithm deterministic, so each Lloyd iteration is one
    assign CTE (argmin over rounded _l2_sql distances, ties to the
    lowest cid) + one update CTE (per-dim rounded avg, re-packed in
    dim order), with empty clusters keeping the previous centroid."""
    parts = [
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k}) init
)"""
    ]
    for i in range(iters):
        parts.append(
            f"""a{i} AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round({_l2_sql('e.embedding', 'c.cvec')}, 6) ASC,
                      c.cid ASC) AS rn
    FROM embeddings e CROSS JOIN c{i} c) s WHERE rn = 1
)"""
        )
        parts.append(
            f"""u{i} AS (
  SELECT cid, list(avg_v ORDER BY dim) AS cvec FROM (
    SELECT a.cid, dm.dim,
           round(avg(CAST(a.embedding[dm.dim] AS DOUBLE)), 6) AS avg_v
    FROM a{i} a CROSS JOIN (SELECT unnest(range(1, {d + 1})) AS dim) dm
    GROUP BY 1, 2) g GROUP BY cid
)"""
        )
        parts.append(
            f"""c{i + 1} AS (
  SELECT p.cid, coalesce(u.cvec, p.cvec) AS cvec
  FROM c{i} p LEFT JOIN u{i} u USING (cid)
)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT vec_id, cid, dist FROM (
  SELECT e.vec_id, c.cid,
         round({_l2_sql('e.embedding', 'c.cvec')}, 6) AS dist,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round({_l2_sql('e.embedding', 'c.cvec')}, 6) ASC,
                    c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN c{iters} c) f WHERE rn = 1
"""
    )


def _bpe_ctes_sql(n_merges: int, score: str = "count") -> str:
    """Shared CTE prefix for the BPE twins: w0 = the word-type table
    in the double-space segmentation convention, then per rank r a
    pair-count CTE, a deterministic-argmax CTE and the merge-applied
    segmentation — the same replace(' a  b ', ' ab ') mechanics as
    operators.bpe (see its module doc for why double spacing makes
    plain replace canonical greedy BPE). ``score='likelihood'`` is the
    WordPiece argmax: count(a,b)/(count(a)*count(b)) as exact double
    division of integer counts — one extra symbol-count CTE per rank,
    same tie-break."""
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS seg,
         count(*) AS f
  FROM (SELECT unnest({TOKS_SQL}) AS word FROM documents) u
  WHERE word <> '' GROUP BY word
)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""pc{r} AS MATERIALIZED (
  SELECT pair, sum(f) AS c FROM (
    SELECT f, unnest(list_transform(
      range(1, greatest(len(syms), 1)),
      i -> syms[i] || '  ' || syms[i + 1])) AS pair
    FROM (SELECT f, string_split(trim(seg), '  ') AS syms FROM w{r - 1}) s
  ) g GROUP BY 1
)"""
        )
        if score == "likelihood":
            parts.append(
                f"""sc{r} AS MATERIALIZED (
  SELECT sym, sum(f) AS cs FROM (
    SELECT f, unnest(string_split(trim(seg), '  ')) AS sym FROM w{r - 1}
  ) g GROUP BY 1
)"""
            )
            parts.append(
                f"""p{r} AS MATERIALIZED (
  SELECT pair, replace(pair, '  ', '') AS m
  FROM pc{r} pc
  JOIN sc{r} sl ON split_part(pc.pair, '  ', 1) = sl.sym
  JOIN sc{r} sr ON split_part(pc.pair, '  ', 2) = sr.sym
  ORDER BY CAST(pc.c AS DOUBLE) / (sl.cs * sr.cs) DESC, pair ASC LIMIT 1
)"""
            )
        else:
            parts.append(
                f"""p{r} AS MATERIALIZED (
  SELECT pair, replace(pair, '  ', '') AS m
  FROM pc{r} ORDER BY c DESC, pair ASC LIMIT 1
)"""
            )
        parts.append(
            f"""w{r} AS MATERIALIZED (
  SELECT replace(w.seg, ' ' || p.pair || ' ', ' ' || p.m || ' ') AS seg,
         w.f
  FROM w{r - 1} w CROSS JOIN p{r} p
)"""
        )
    return ",\n".join(parts)


def _bpe_merges_sql(n_merges: int, score: str = "count") -> str:
    union = "\nUNION ALL\n".join(
        f"""SELECT {r} AS "rank", split_part(pair, '  ', 1) AS "left",
       split_part(pair, '  ', 2) AS "right", m AS merged FROM p{r}"""
        for r in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_ctes_sql(n_merges, score)}\n{union}"


def _bpe_encode_sql(n_merges: int, merges=None) -> str:
    """``merges`` (r13, the bench train/encode split — the
    ``_unigram_encode_sql(model_sql=...)`` pattern): an already-
    trained ``[(rank, left, right, merged), ...]`` list inlined as
    literal 1-row ``p{r}`` CTEs in place of the trainer chain, so the
    twin times encoding alone (``n_merges`` is ignored — the chain
    length follows the list). Default ``None`` keeps the composed
    trainer+encode twin the correctness registry uses."""
    if merges is not None:
        n_merges = len(merges)
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT doc_id, text,
         '  ' || array_to_string(list_transform(
           list_filter({TOKS_SQL}, t -> t <> ''),
           w -> regexp_replace(w, '(.)', '\\1  ', 'g')), '|  ') AS seg
  FROM documents
)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""e{r} AS MATERIALIZED (
  SELECT e.doc_id, e.text,
         replace(e.seg, ' ' || p.pair || ' ', ' ' || p.m || ' ') AS seg
  FROM e{r - 1} e CROSS JOIN p{r} p
)"""
        )
    toks = (
        "list_filter(string_split(trim(seg), '  '), "
        "t -> t <> '' AND t <> '|')"
    )
    if merges is not None:
        def q(v):
            return v.replace("'", "''")

        head = ",\n".join(
            f"p{r} AS (SELECT '{q(left)}  {q(right)}' AS pair, "
            f"'{q(merged)}' AS m)"
            for r, left, right, merged in merges
        )
    else:
        head = _bpe_ctes_sql(n_merges)
    return (
        f"WITH {head},\n"
        + ",\n".join(parts)
        + f"""
SELECT doc_id,
  CASE WHEN text IS NULL THEN NULL
       ELSE CAST(len({toks}) AS INT) END AS n_tokens_bpe,
  CASE WHEN text IS NULL THEN NULL
       ELSE array_to_string({toks}, ' ') END AS encoded
FROM e{n_merges}
"""
    )


def _lr_feats_sql(where: str, n_buckets: int) -> str:
    """Hashed unigram+bigram count features — the same fragment the
    DSIR twin uses (md5 bucket, chr(1)-joined bigrams)."""
    base = (
        f"SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks "
        f"FROM documents WHERE {where}"
    )
    return f"""SELECT doc_id, bucket, count(*) AS c FROM (
    SELECT doc_id,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT % {n_buckets} AS bucket
    FROM (
      SELECT doc_id, unnest(toks) AS gram FROM ({base})
      UNION ALL
      SELECT doc_id, w1 || chr(1) || w2 AS gram FROM (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM (SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) AS pos
              FROM ({base}) b)
      ) x WHERE w2 IS NOT NULL
    ) g) h GROUP BY 1, 2"""


def _lr_cte_sql(
    train_where: str,
    score_where: str,
    label_expr: str,
    n_buckets: int,
    iters: int,
    lr: float,
) -> str:
    """Unrolled gradient-descent twin of classifier.lr_fit/classify:
    fixed iterations in BIGINT micro-units fixed point (r8 — see the
    classifier module docstring): z, residuals and gradients are
    exact integer sums, σ is the only float op, and the weight update
    round(lr·g/n) is the identical IEEE expression both engines fold,
    so the trajectory matches bit-for-bit by arithmetic rather than
    by rounding luck. MATERIALIZED throughout — the iteration chain
    re-evaluates exponentially if inlined."""
    parts = [
        f"tfeats AS MATERIALIZED ({_lr_feats_sql(train_where, n_buckets)})",
        f"""labels AS MATERIALIZED (
  SELECT doc_id, CAST({label_expr} AS DOUBLE) AS y
  FROM documents WHERE {train_where}
)""",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM labels)",
        f"""w0 AS MATERIALIZED (
  SELECT unnest(range(-1, {n_buckets})) AS bucket, CAST(0 AS BIGINT) AS wm
)""",
    ]
    for t in range(iters):
        parts.append(
            f"""z{t} AS MATERIALIZED (
  SELECT l.doc_id, l.y, coalesce(fs.zm, 0) + b.bm AS zm
  FROM labels l
  LEFT JOIN (SELECT f.doc_id, sum(f.c * w.wm) AS zm
             FROM tfeats f JOIN w{t} w USING (bucket) GROUP BY 1) fs
    USING (doc_id)
  CROSS JOIN (SELECT wm AS bm FROM w{t} WHERE bucket = -1) b
)"""
        )
        parts.append(
            f"""r{t} AS MATERIALIZED (
  SELECT doc_id,
         CAST(round((y - round(1.0 / (1.0 + exp(-(zm / 1000000.0))), 6))
                    * 1000000.0, 0) AS BIGINT) AS rm
  FROM z{t}
)"""
        )
        parts.append(
            f"""g{t} AS MATERIALIZED (
  SELECT f.bucket, sum(f.c * r.rm) AS g
  FROM tfeats f JOIN r{t} r USING (doc_id) GROUP BY 1
  UNION ALL
  SELECT -1 AS bucket, sum(rm) AS g FROM r{t}
)"""
        )
        parts.append(
            f"""w{t + 1} AS MATERIALIZED (
  SELECT w.bucket,
         w.wm + CAST(round({lr} * coalesce(g.g, 0) / nn.n, 0) AS BIGINT)
           AS wm
  FROM w{t} w LEFT JOIN g{t} g USING (bucket) CROSS JOIN nn
)"""
        )
    parts.append(
        f"sfeats AS MATERIALIZED ({_lr_feats_sql(score_where, n_buckets)})"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT doc_id, round(1.0 / (1.0 + exp(-(zm / 1000000.0))), 6) AS score,
       round(1.0 / (1.0 + exp(-(zm / 1000000.0))), 6) >= 0.5 AS pred
FROM (
  SELECT d.doc_id, coalesce(fs.zm, 0) + b.bm AS zm
  FROM (SELECT doc_id FROM documents WHERE {score_where}) d
  LEFT JOIN (SELECT f.doc_id, sum(f.c * w.wm) AS zm
             FROM sfeats f JOIN w{iters} w USING (bucket) GROUP BY 1) fs
    USING (doc_id)
  CROSS JOIN (SELECT wm AS bm FROM w{iters} WHERE bucket = -1) b) sz
"""
    )


def _bucket_sql(col: str, n_bits: int) -> str:
    """Sign-bit bucket (1-based DuckDB list index ↔ getItem(i))."""
    return "(" + " + ".join(
        f"CASE WHEN {col}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(n_bits)
    ) + ")"


def _sqllist(strings) -> str:
    return "[" + ", ".join(f"'{s}'" for s in strings) + "]"


def _stop_hits_sql(stopwords) -> str:
    return (
        f"len(list_filter({TOKS_SQL}, t -> list_contains({_sqllist(stopwords)}, t)))"
    )


# Memoized raw scans, per session × path: repeated query builds
# (bench min-of-N, the 38-query driver gate) reuse the analyzed
# relation and its InMemoryFileIndex instead of re-listing files and
# re-reading parquet footers on every invocation — pure fixed-overhead
# savings; the returned DataFrame is immutable so sharing is safe. On
# a cluster the same trick is "define the table once" (catalog table).
# WeakKeyDictionary on the session: entries die with the session
# (stopped sessions are not pinned for process lifetime). Files at a
# path are assumed immutable while the session lives.
import weakref

_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, Dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    per_session = _SCAN_CACHE.setdefault(spark, {})
    if path not in per_session:
        per_session[path] = spark.read.parquet(path)
    return per_session[path]


def _lineitem_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        (F.col("l_discount") > 0.05).cast("bigint").alias("class"),
    )


def _lineitem_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Features + class only — key columns excluded so they are not
    split candidates (Q-5: every numeric non-class column is one)."""
    return _lineitem_base(spark, sf_dir).select(*FEATURES, "class")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read_parquet(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read_parquet(spark, f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events read with the footer's actual timestamp unit honored
    (sources.read_events: plain typed read for MICROS — the current
    driver data — raw-INT64 + exact `ts DIV 1000` truncation only for
    NANOS). Every downstream event-time op here is
    timezone-independent (F.window aligns on epoch micros; outputs
    are epoch-second BIGINTs)."""
    from decision_tree_stuff_spark.sources import load_table

    return load_table(spark, sf_dir, "events")


def _melted_with_threshold(spark, sf_dir):
    from pyspark.sql import Window

    df = _read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", *FEATURES_SMALL
    )
    melted = df.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=FEATURES_SMALL,
        variableColumnName="variable",
        valueColumnName="value",
    )
    w = Window.partitionBy("variable")
    return melted.withColumn("threshold", F.avg("value").over(w))


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


INFERENCE_TREE = {
    "l_discount <= 0.05": {"class": 0},
    "l_discount > 0.05": {
        "l_quantity <= 25.0": {"class": 0},
        "l_quantity > 25.0": {"class": 1},
    },
}


def _pair_graph(spark, sf_dir):
    """The e7 family's blocked-Jaccard pair graph (threshold 0.8,
    lang+len_bucket blocks) — shared by the graph-analytics queries."""
    docs = _docs(spark, sf_dir).withColumn(
        "len_bucket", (F.col("n_chars") / 100).cast("bigint")
    )
    pairs = ngram_jaccard_pairs(
        docs, block_cols=["lang", "len_bucket"], threshold=0.8
    )
    return docs, pairs


SAMPLE_RATE, SAMPLE_SEED = 0.2, "s42"
SPLIT_FRACTIONS, SPLIT_SEED = {"train": 0.8, "val": 0.1, "test": 0.1}, "split1"


STRATA_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}
STRATA_DEFAULT, STRATA_SEED = 0.05, "mix1"
SHUFFLE_SEED, PACK_SEED, PACK_SEQ_LEN = "sh1", "pk1", 512


BUDGETS = {"en": 20000, "de": 8000}  # n_chars budget per language
BUDGET_SEED = "budget1"


DECON_N, DECON_THRESHOLD = 3, 0.2
BLOOM_T = 0.5


KMEANS_K, KMEANS_ITERS, KMEANS_D = 8, 3, 64


CMS_WATCHLIST = [
    "scan", "column", "window", "order", "the", "data", "query", "zzz_absent",
]

# BM25 probe set: mixes hot tokens (dense vocab) with the one rare
# token ('dup', df≈29/500 at sf0.001) so idf actually discriminates.
BM25_QUERIES = [
    (1, "fast hash join"),
    (2, "window sort order by"),
    (3, "dup scan table"),
    (4, "spark stream batch data"),
]
BM25_K, BM25_K1, BM25_B = 5, 1.2, 0.75
_BM25_VALUES_SQL = ", ".join(f"({i}, '{t}')" for i, t in BM25_QUERIES)


HYBRID_PROBES = [0, 1, 2, 3, 4]
HYBRID_K = 10


BPE_MERGES = 12
LR_BUCKETS, LR_ITERS, LR_RATE = 64, 4, 0.1


CHUNK_TOKENS, CHUNK_STRIDE = 40, 30


# ---------------------------------------------------------------------
# Oracle SQL (DuckDB) — exact twins of the above
# ---------------------------------------------------------------------

_G_SQL = f"""WITH {BASE_SQL},
{MELT_SQL},
t AS (SELECT *, AVG(value) OVER (PARTITION BY variable) AS threshold FROM melt),
g AS (
  SELECT variable, threshold,
         COALESCE(AVG(CASE WHEN value <= threshold THEN class END), 0.0) AS left_p1,
         COALESCE(AVG(CASE WHEN value > threshold THEN class END), 0.0) AS right_p1
  FROM t GROUP BY variable, threshold
)"""

_METRIC_SQL = f"({_h_sql('left_p1')}) + ({_h_sql('right_p1')})"

_DOCSTATS_SR = f"{_stop_hits_sql(QUALITY_STOPWORDS)} / CAST(greatest(len({TOKS_SQL}), 1) AS DOUBLE)"
_DOCSTATS_PR = (
    "(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))"
    " / CAST(greatest(length(text), 1) AS DOUBLE)"
)
_LANG_SCORES = {lang: _stop_hits_sql(stops) for lang, stops in LANG_STOPWORDS.items()}
_LANG_MAX = "greatest(" + ", ".join(_LANG_SCORES[lang] for lang in LANGS) + ")"
_LANG_CASE = (
    "CASE WHEN " + _LANG_MAX + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN {_LANG_SCORES[lang]} = {_LANG_MAX} THEN '{lang}'" for lang in LANGS
    )
    + " END"
)

# md5-SimHash oracle fragments (e2_simhash_md5): bit j of md5 = low
# nibble bit j%4 of hex digit j//4; vote sums and sign-bit assembly
# mirror operators.dedup.simhash exactly.
def _sh_bit_sql(j: int) -> str:
    return (
        f"(((strpos('0123456789abcdef', substr(md5(token), {j // 4 + 1}, 1))"
        f" - 1) >> {j % 4}) & 1)"
    )


_SH_VOTES = ",\n".join(
    f"         sum(CASE WHEN {_sh_bit_sql(j)} = 1 THEN 1 ELSE -1 END) AS v{j}"
    for j in range(64)
)
_SH_LO = " + ".join(
    f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(32)
)
_SH_HI = " + ".join(
    f"CASE WHEN v{j + 32} > 0 THEN {1 << j} ELSE 0 END" for j in range(32)
)

# md5-MinHash oracle fragments (e2_minhash_md5_pairs): 64 min-md5
# aggregates, 8 bands of 8, banding key = md5 of '|'-joined members —
# the exact twin of minhash_lsh_pairs(hash_fn='md5').
_MH_N, _MH_BANDS = 64, 8
_MH_R = _MH_N // _MH_BANDS
_MH_SIG_AGGS = ",\n".join(
    f"         min(md5('{i}|' || token)) AS s{i}" for i in range(_MH_N)
)
_MH_BAND_KEYS = ",\n           ".join(
    "md5(" + " || '|' || ".join(f"s{b * _MH_R + j}" for j in range(_MH_R)) + ")"
    for b in range(_MH_BANDS)
)
_MH_AGREE = " + ".join(
    f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(_MH_N)
)

# md5km (Kirsch-Mitzenmacher) fragments: ONE md5 per token split into
# two 60-bit halves, components h_i = (h1 + i*h2) mod P — exact twin
# of minhash_lsh_pairs(hash_fn='md5km'). DuckDB's ('0x'||hex)::BIGINT
# equals Spark's conv(hex, 16, 10) (verified value-for-value).
_KM_P = 4294967291
_KM_HASHES = f"""
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 15))::BIGINT % {_KM_P} AS h1,
         ('0x' || substr(md5(token), 17, 15))::BIGINT % {_KM_P} AS h2
  FROM toks
"""
_KM_SIG_AGGS = ",\n".join(
    f"         min((h1 + {i} * h2) % {_KM_P}) AS s{i}" for i in range(_MH_N)
)
_KM_BAND_KEYS = ",\n           ".join(
    "md5(concat_ws('|', "
    + ", ".join(f"s{b * _MH_R + j}" for j in range(_MH_R))
    + "))"
    for b in range(_MH_BANDS)
)

# random-hyperplane LSH oracle fragments (e3_rh_lsh_topk): the SAME
# seeded plane literals as the Spark plan (single source of truth:
# similarity.hyperplanes), projected with list_dot_product.
from decision_tree_stuff_spark.operators.similarity import (  # noqa: E402
    hyperplanes as _rh_hyperplanes,
)

# JL random projection (e3_rp_topk): the SAME seeded Gaussian rows as
# the Spark plan (single source: similarity.hyperplanes), folded with
# the _cos_sql-proven list_zip/list_sum order so every projected
# coordinate matches bit-for-bit.
from decision_tree_stuff_spark.operators.similarity import (  # noqa: E402
    RP_DIM as _RP_DIM,
    RP_SEED as _RP_SEED,
)

_RP_PLANES = _rh_hyperplanes(_RP_DIM, 64, _RP_SEED)
_RP_SCALE = 1.0 / (_RP_DIM ** 0.5)


def _rp_dot_sql(col: str, row) -> str:
    lits = ", ".join(repr(v) for v in row)
    return (
        f"list_sum(list_transform(list_zip({col}, [{lits}]), "
        f"x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)))"
    )


_RP_PV = "[" + ",\n    ".join(
    f"({_rp_dot_sql('embedding', row)}) * {_RP_SCALE!r}"
    for row in _RP_PLANES
) + "]"

# Bloom decontamination (e9_bloom_decontam): single source of truth
# for (m, k) is the operator module
from decision_tree_stuff_spark.operators.decontam import (  # noqa: E402
    BLOOM_K as _BLOOM_K,
    BLOOM_M as _BLOOM_M,
)

# Count-min sketch (e4_cms_*): (d, w) and the cell-twin generator are
# single-sourced in the operator module
from decision_tree_stuff_spark.operators.sketch import (  # noqa: E402
    CMS_D as _CMS_D,
    CMS_W as _CMS_W,
    cms_sql_cells as _cms_sql_cells,
)

_RH_N_PLANES = 4
_RH_PLANES = _rh_hyperplanes(_RH_N_PLANES, 64, 42)

# Stupid Backoff factor ln(0.4), computed ONCE in Python and embedded
# as a literal in both the Spark plan (textstats.stupid_backoff_logprob
# default alpha) and the DuckDB twin below.
import math as _math

_LN_BACKOFF = _math.log(0.4)
_RH_BUCKET = " + ".join(
    "CASE WHEN list_dot_product(embedding, ["
    + ", ".join(repr(v) for v in h)
    + f"]) >= 0 THEN {1 << i} ELSE 0 END"
    for i, h in enumerate(_RH_PLANES)
)
# Hamming-1 multiprobe list: own bucket + each single bit flipped
_RH_PROBES = ", ".join(
    ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(_RH_N_PLANES)]
)

def _compositions(n: int, p: int):
    """All ordered compositions of ``n`` into parts <= ``p``."""
    if n == 0:
        return [[]]
    out = []
    for k in range(1, min(p, n) + 1):
        out += [[k] + rest for rest in _compositions(n - k, p)]
    return out


def _unigram_encode_sql(
    vocab_size: int = 40,
    seed_size: int = 60,
    P: int = 3,
    W: int = 8,
    em_iters: int = 2,
    model_sql: str | None = None,
) -> str:
    """Twin of ``bpe.unigram_encode`` that verifies the Viterbi DP by
    EXHAUSTIVE ENUMERATION: the trainer CTE chain (``_unigram_lm_sql``
    verbatim, as a subquery) yields the model, then every word is
    scored against ALL segmentations into pieces <= ``P`` chars (one
    UNION ALL branch per composition of each length <= ``W`` — 176
    branches at P=3/W=8, over the DISTINCT-word table). Products are
    written LEFT-NESTED in word order — the exact association the
    Spark fold uses, so scores are bit-identical — and the winner is
    ``ORDER BY score DESC, rkey DESC`` where ``rkey`` is the REVERSED
    piece-length digit string: lexicographically-largest-reversed-
    lengths is precisely the DP's greedy-from-the-end longer-piece
    tie rule. Spark computes the argmax in O(n·P) per word; the twin
    checks it against all O(3^n) candidates — agreement proves the
    DP, not just reproduces it.

    ``model_sql`` (r13, the bench train/encode split): a SELECT
    yielding ``(rank, piece, count_micro)`` that REPLACES the trainer
    CTE chain — the bench inlines the already-trained pieces as a
    VALUES literal so the encode twin times encoding alone, exactly
    like the Spark side (which gets the same driver-side pieces
    list). Default ``None`` keeps the composed trainer+encode twin
    used by the correctness registry."""
    unk = repr(2.0 ** -40)

    def pl(s: str, k: int) -> str:
        fb = unk if k == 1 else "0.0"
        return f"COALESCE((SELECT p FROM probs v WHERE v.piece = {s}), {fb})"

    branches = []
    for n in range(1, W + 1):
        for comp in _compositions(n, P):
            pos, pieces = 1, []
            for k in comp:
                pieces.append((f"substr(word, {pos}, {k})", k))
                pos += k
            score = pl(*pieces[0])
            for s, k in pieces[1:]:
                score = f"({score} * {pl(s, k)})"
            enc = " || ' ' || ".join(s for s, _ in pieces)
            rkey = "".join(str(k) for k in reversed(comp))
            branches.append(
                f"""SELECT word, {enc} AS enc, {score} AS score,
       '{rkey}' AS rkey, {len(comp)} AS np
FROM uwords WHERE length(word) = {n}"""
            )
    segs = "\nUNION ALL\n".join(branches)
    model_src = model_sql or _unigram_lm_sql(
        vocab_size, seed_size, P, W, em_iters
    )
    return f"""
WITH model AS MATERIALIZED ({model_src}),
probs AS MATERIALIZED (
  SELECT piece,
         CAST(count_micro AS DOUBLE)
           / (SELECT CAST(SUM(count_micro) AS DOUBLE) FROM model) AS p
  FROM model
),
dwords AS MATERIALIZED (
  SELECT doc_id, i, substr(toks[CAST(i AS INT) + 1], 1, {W}) AS word
  FROM (
    SELECT doc_id, toks, unnest(range(0, len(toks))) AS i FROM (
      SELECT doc_id, list_filter({TOKS_SQL}, t -> t <> '') AS toks
      FROM documents
    ) t0
  ) u
),
uwords AS MATERIALIZED (SELECT DISTINCT word FROM dwords),
segs AS ({segs}),
best AS MATERIALIZED (
  SELECT word, enc, np FROM (
    SELECT word, enc, np,
           row_number() OVER (PARTITION BY word
                              ORDER BY score DESC, rkey DESC) AS rn
    FROM segs
  ) r WHERE rn = 1
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE CAST(coalesce(SUM(b.np), 0) AS INT) END AS n_pieces,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(string_agg(b.enc, ' ' ORDER BY w.i), '') END
         AS encoded
FROM (SELECT doc_id, text FROM documents) d
LEFT JOIN dwords w USING (doc_id)
LEFT JOIN best b USING (word)
GROUP BY d.doc_id, d.text
"""


def _unigram_lm_sql(
    vocab_size: int = 40,
    seed_size: int = 60,
    P: int = 3,
    W: int = 8,
    em_iters: int = 2,
) -> str:
    """Unrolled soft-EM twin of ``bpe.unigram_lm_train`` (r11): the
    forward/backward lattice DP becomes one lateral-alias column
    chain per EM iteration (a_i / r_d columns; r_d = beta at distance
    d from the word end, matching the Spark fold's end-first array),
    written with the IDENTICAL term order and parenthesization as the
    Spark expressions — IEEE +,*,/ are exactly specified, so the
    alphas/betas match bit-for-bit (the LR/e9c portability contract).
    Expected counts round to micro-unit integers PER EDGE before any
    sum, so aggregation order is immaterial; M-step probabilities are
    exact double divisions of those integers. Columns beyond a word's
    length compute harmless junk that nothing indexes (edges stop at
    n). Each DP column is its OWN MATERIALIZED CTE: DuckDB's binder
    rejects lateral aliases whose expression contains a subquery (the
    prob lookups are correlated scalar subqueries), and each a_i is
    referenced by up to P later columns — inlined CTEs re-evaluate
    multiplicatively (the e12 oracle lesson), so every link in the
    chain materializes."""
    pieces_cte = f"""words AS MATERIALIZED (
  SELECT substr(tok, 1, {W}) AS word, CAST(count(*) AS BIGINT) AS f FROM (
    SELECT unnest(list_filter({TOKS_SQL}, t -> t <> '')) AS tok
    FROM documents
  ) GROUP BY 1
),
spos AS (
  SELECT word, f, CAST(unnest(range(1, length(word) + 1)) AS INT) AS i
  FROM words
),
skl AS (
  SELECT word, f, i,
         CAST(unnest(range(1, least({P}, length(word) - i + 1) + 1)) AS INT) AS k
  FROM spos
),
subs AS MATERIALIZED (
  SELECT substr(word, i, k) AS piece, SUM(f) AS cnt FROM skl GROUP BY 1
),
vocab0 AS MATERIALIZED (
  SELECT piece, cnt FROM subs WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM subs WHERE length(piece) >= 2
    ORDER BY cnt DESC, piece ASC LIMIT {seed_size}
  )
),
v0 AS MATERIALIZED (
  SELECT piece,
         CAST(cnt AS DOUBLE) / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM vocab0) AS p
  FROM vocab0
)"""
    parts = [pieces_cte]
    for t in range(em_iters):
        def pl(s: str) -> str:
            return f"COALESCE((SELECT p FROM v{t} v WHERE v.piece = {s}), 0.0)"

        parts.append(
            f"""dp{t}_a0 AS MATERIALIZED (
  SELECT word, f, length(word) AS n, 1.0 AS a0 FROM words
)"""
        )
        prev = f"dp{t}_a0"
        for i in range(1, W + 1):
            terms = []
            for k in range(1, P + 1):
                if i - k >= 0:
                    terms.append(
                        f"(a{i - k} * {pl(f'substr(word, {i - k + 1}, {k})')})"
                    )
                else:
                    terms.append("0.0")
            parts.append(
                f"""dp{t}_a{i} AS MATERIALIZED (
  SELECT *, ({' + '.join(terms)}) AS a{i} FROM {prev}
)"""
            )
            prev = f"dp{t}_a{i}"
        parts.append(
            f"""dp{t}_r0 AS MATERIALIZED (
  SELECT *, 1.0 AS r0 FROM {prev}
)"""
        )
        prev = f"dp{t}_r0"
        for d in range(1, W + 1):
            terms = []
            for k in range(1, P + 1):
                if k <= d:
                    terms.append(
                        f"({pl(f'substr(word, n - {d} + 1, {k})')} * r{d - k})"
                    )
                else:
                    terms.append("0.0")
            parts.append(
                f"""dp{t}_r{d} AS MATERIALIZED (
  SELECT *, ({' + '.join(terms)}) AS r{d} FROM {prev}
)"""
            )
            prev = f"dp{t}_r{d}"
        al = ", ".join(f"a{i}" for i in range(W + 1))
        rl = ", ".join(f"r{d}" for d in range(W + 1))
        parts.append(
            f"""dl{t} AS (
  SELECT word, f, n, list_value({al}) AS al, list_value({rl}) AS rl
  FROM {prev}
),
ej{t} AS (
  SELECT word, f, n, al, rl, CAST(unnest(range(0, n)) AS INT) AS j
  FROM dl{t}
),
ek{t} AS (
  SELECT word, f, n, al, rl, j,
         CAST(unnest(range(1, least({P}, n - j) + 1)) AS INT) AS k
  FROM ej{t}
),
ed{t} AS MATERIALIZED (
  SELECT piece, CAST(SUM(CAST(em AS BIGINT)) AS BIGINT) AS em FROM (
    SELECT v.piece,
      CASE WHEN e.al[e.n + 1] > 0.0 THEN
        round(((((e.al[e.j + 1] * v.p) * e.rl[e.n - (e.j + e.k) + 1])
                / e.al[e.n + 1]) * CAST(e.f AS DOUBLE)) * 1000000.0)
      ELSE 0.0 END AS em
    FROM ek{t} e JOIN v{t} v ON v.piece = substr(e.word, e.j + 1, e.k)
  ) GROUP BY 1
),
v{t + 1} AS MATERIALIZED (
  SELECT piece,
         CAST(em AS DOUBLE) / (SELECT CAST(SUM(em) AS DOUBLE) FROM ed{t}) AS p
  FROM ed{t}
)"""
        )
    last = em_iters - 1
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT "rank", piece, count_micro FROM (
  SELECT CAST(row_number() OVER (ORDER BY em DESC, piece ASC) AS INT) AS "rank",
         piece, em AS count_micro
  FROM ed{last} WHERE em > 0
) ranked WHERE "rank" <= {vocab_size}
"""
    )
