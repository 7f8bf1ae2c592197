"""Core dataflow operators (SURVEY.md §2.1): o01-o12 plus the tree/forest/regression fit+transform rows.

Split out of the monolithic queries.py (r9); function and
oracle text moved verbatim — see queries/__init__.py for
the registry.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    BASE_SQL,
    DecisionNode,
    DecisionTree,
    DecisionTreeParams,
    EVENT_TYPES,
    F,
    FEATURES,
    FEATURES_SMALL,
    INFERENCE_TREE,
    MELT_IDS_SQL,
    MELT_SQL,
    RFEATURES,
    SplitParams,
    TOKS_SQL,
    _G_SQL,
    _METRIC_SQL,
    _apply_cte,
    _bag_where_sql,
    _docs,
    _events,
    _gbt_cte_sql,
    _h_sql,
    _lineitem_base,
    _lineitem_features,
    _melted_with_threshold,
    _read_parquet,
    _rtree_cte_sql,
    _tree_train_cte,
    compute_all_splits,
)



# ---------------------------------------------------------------------
# Core operators (SURVEY.md §2.1) on lineitem + derived binary class
# ---------------------------------------------------------------------

def q_o01_filter_split(spark, sf_dir):
    """O-1 predicate filter-split (left half)."""
    df = _read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )
    left, _right = SplitParams("l_quantity", 25.0).split(df)
    return left


def q_o02_unpivot(spark, sf_dir):
    """O-2 wide→long unpivot."""
    df = _read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", *FEATURES_SMALL
    )
    return df.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=FEATURES_SMALL,
        variableColumnName="variable",
        valueColumnName="value",
    )


def q_o02b_pivot(spark, sf_dir):
    """Long→wide pivot (inverse of O-2): per-user event-type counts.
    Explicit value list keeps the output schema static — at scale an
    inferred pivot needs an extra distinct pass and can explode the
    column count."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def q_o03_window_threshold(spark, sf_dir):
    """O-3 per-group scalar window (mean threshold per variable)."""
    return _melted_with_threshold(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "variable",
        "value",
        F.round("threshold", 6).alias("threshold"),
    )


def q_o04_side_tag(spark, sf_dir):
    """O-4 derived boolean side-membership column."""
    return _melted_with_threshold(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "variable",
        "value",
        (F.col("value") <= F.col("threshold")).alias("left"),
    )


def q_o05_conditional_agg(spark, sf_dir):
    """O-5 hash group-by with conditional mean + null→0 per side."""
    scored = compute_all_splits(_lineitem_features(spark, sf_dir), "class", "entropy", "mean")
    return scored.select(
        "variable",
        F.round("threshold", 6).alias("threshold"),
        F.round("left_p1", 6).alias("left_p1"),
        F.round("right_p1", 6).alias("right_p1"),
    )


def q_o06_split_scores(spark, sf_dir):
    """O-6 impurity scoring over every candidate."""
    scored = compute_all_splits(_lineitem_features(spark, sf_dir), "class", "entropy", "mean")
    return scored.select(
        "variable",
        F.round("threshold", 6).alias("threshold"),
        F.round("left_p1", 6).alias("left_p1"),
        F.round("right_p1", 6).alias("right_p1"),
        F.round("metric", 6).alias("metric"),
    )


def q_o06b_split_scores_median_gini(spark, sf_dir):
    """O-6 variant exercising the exact-median splitter and gini
    metric through the gate (the primary queries use mean/entropy)."""
    scored = compute_all_splits(
        _lineitem_features(spark, sf_dir), "class", "gini", "median"
    )
    return scored.select(
        "variable",
        F.round("threshold", 6).alias("threshold"),
        F.round("left_p1", 6).alias("left_p1"),
        F.round("right_p1", 6).alias("right_p1"),
        F.round("metric", 6).alias("metric"),
    )


def q_o07_best_split(spark, sf_dir):
    """O-7 ordered top-1 candidate (deterministic tie-break)."""
    scored = compute_all_splits(_lineitem_features(spark, sf_dir), "class", "entropy", "mean")
    return scored.limit(1).select(
        "variable",
        F.round("threshold", 6).alias("threshold"),
        F.round("metric", 6).alias("metric"),
    )


def q_o08_majority(spark, sf_dir):
    """O-8 majority vote (mode) with deterministic tie-break."""
    return (
        _lineitem_base(spark, sf_dir)
        .groupBy(F.col("class").alias("label"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("label").asc())
        .limit(1)
    )


def q_o09_constant_label(spark, sf_dir):
    """O-9 constant prediction column (leaf inference)."""
    return _read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        F.lit(1).cast("tinyint").alias("prediction"),
    )


def q_o11_tree_inference(spark, sf_dir):
    """O-11 fused tree inference: depth-2 tree as one nested CASE WHEN."""
    node = DecisionNode.from_dict(INFERENCE_TREE)
    df = _read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        node.to_expr().cast("tinyint").alias("prediction"),
    )


def q_o12_scalar_stats(spark, sf_dir):
    """O-12 fused scalar aggregate: count + class-sum + p1 + entropy in
    ONE pass (the reference runs three; SURVEY.md §3.1)."""
    from decision_tree_stuff_spark.splitting import EntropySplitMetric

    return _lineitem_base(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("class").alias("n1"),
        F.round(F.avg("class"), 6).alias("p1"),
        F.round(
            EntropySplitMetric.eval_from_p1_expr(F.avg("class")), 6
        ).alias("entropy"),
    )


def q_tree_fit_transform(spark, sf_dir):
    """O-13 full fit + O-11 transform (multi-query algorithm — no
    single-SQL oracle; driver records rows-only)."""
    base = _lineitem_base(spark, sf_dir)
    dt = DecisionTree(
        DecisionTreeParams([], "class", "mean", "entropy", max_depth=3)
    )
    dt.fit(base.select(*FEATURES, "class"))
    return dt.transform(base).select("l_orderkey", "l_linenumber", "prediction")


def q_rtree_fit_transform(spark, sf_dir):
    """E-12 CART regression tree (r7): depth-2 mean-threshold
    variance-reduction fit on lineitem, target l_discount — the
    continuous-target member of the tree family. The DuckDB twin
    derives the same tree level-by-level (``_rtree_cte_sql``) and the
    hash compares the 6dp-rounded leaf-mean predictions row by row."""
    from decision_tree_stuff_spark.operators.regression_tree import (
        RegressionTree,
    )

    base = _lineitem_base(spark, sf_dir)
    rt = RegressionTree(
        "l_discount", features=RFEATURES, max_depth=2
    ).fit(base.select(*RFEATURES, "l_discount"))
    return base.select(
        "l_orderkey", "l_linenumber", rt.prediction_expr().alias("prediction")
    )


def q_gbt_fit_transform(spark, sf_dir):
    """E-12b gradient boosting (r7, Friedman 2001): three depth-2
    squared-error stages on running residuals, lr=0.5, target
    l_discount. The twin unrolls the identical stage chain
    (``_gbt_cte_sql``); predictions compare at 6dp."""
    from decision_tree_stuff_spark.operators.regression_tree import (
        GradientBoostedTrees,
    )

    base = _lineitem_base(spark, sf_dir)
    gbt = GradientBoostedTrees(
        "l_discount",
        features=RFEATURES,
        n_trees=3,
        learning_rate=0.5,
        max_depth=2,
    ).fit(base.select(*RFEATURES, "l_discount"))
    return base.select(
        "l_orderkey",
        "l_linenumber",
        gbt.prediction_expr().alias("prediction"),
    )


def q_tree_fit_median_gini(spark, sf_dir):
    """O-13 under the OTHER splitter/metric pair (r7): a depth-2
    median/gini fit + transform, oracled by the SAME level-wise CTE
    generator with quantile_cont threshold + gini impurity — evidence
    the flagship oracle generalizes across hyperparameter
    configurations instead of encoding one tree."""
    base = _lineitem_base(spark, sf_dir)
    dt = DecisionTree(
        DecisionTreeParams([], "class", "median", "gini", max_depth=2)
    )
    dt.fit(base.select(*FEATURES, "class"))
    return dt.transform(base).select("l_orderkey", "l_linenumber", "prediction")


def q_forest_fit_transform(spark, sf_dir):
    """Bagged 3-tree forest fit + majority-vote transform (ensemble
    extension, forest.py — multi-query fit, no single-SQL oracle;
    driver records rows-only). Inference stays ONE projection: the
    vote is a sum of the trees' fused CASE expressions."""
    from decision_tree_stuff_spark.forest import DecisionForest, ForestParams

    base = _lineitem_base(spark, sf_dir)
    forest = DecisionForest(
        ForestParams(
            DecisionTreeParams([], "class", "mean", "entropy", max_depth=3),
            n_trees=3,
            sample_rate=0.7,
            seed="gate",
        )
    )
    forest.fit(base.select(*FEATURES, "class"), key_cols=list(FEATURES))
    return forest.transform(base).select(
        "l_orderkey", "l_linenumber", "prediction"
    )


def q_linreg_fit_transform(spark, sf_dir):
    """Closed-form linear regression (r7, E-12c): a token-count
    estimator — fit n_tokens ≈ w0 + w1·chars + w2·vowels by one-pass
    normal equations (exact BIGINT moments → Cramer solve → literal
    projection), the calibration pattern that budgets tokens at
    100 TB without tokenizing. Coefficients — not just the rounded
    predictions — are bit-identical to the DuckDB twin because the
    Gram matrix is integer-exact and the solve mirrors the same IEEE
    expression tree."""
    from decision_tree_stuff_spark.functions.text import tokens
    from decision_tree_stuff_spark.operators.linreg import (
        linreg_fit,
        linreg_transform,
    )

    from decision_tree_stuff_spark.operators import spread_small

    # regex-heavy per-row projection — spread a single-split bench
    # file first (guarded no-op on real multi-split tables)
    docs = spread_small(_docs(spark, sf_dir))
    feats = docs.select(
        "doc_id",
        F.col("n_chars").alias("chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))
        ).alias("vowels"),
        F.size(
            F.filter(tokens(F.col("text")), lambda t: t != "")
        ).alias("n_tokens"),
    )
    model = linreg_fit(feats, "n_tokens", ["chars", "vowels"])
    out = linreg_transform(
        feats, model, ["chars", "vowels"], output_col="est_tokens"
    )
    return out.select(
        "doc_id",
        "chars",
        "vowels",
        "n_tokens",
        "est_tokens",
        F.round(F.col("n_tokens") - F.col("est_tokens"), 6).alias("resid"),
    )

ORACLE_SQL: Dict[str, str] = {
    "o01_filter_split": """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem WHERE l_quantity <= 25.0
""",
    "o02_unpivot": f"WITH {MELT_IDS_SQL} SELECT * FROM melt",
    "o02b_pivot": """
SELECT user_id,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
       CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
       CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
FROM events GROUP BY user_id
""",
    "o03_window_threshold": f"""
WITH {MELT_IDS_SQL}
SELECT l_orderkey, l_linenumber, variable, value,
       round(AVG(value) OVER (PARTITION BY variable), 6) AS threshold
FROM melt
""",
    "o04_side_tag": f"""
WITH {MELT_IDS_SQL}
SELECT l_orderkey, l_linenumber, variable, value,
       value <= AVG(value) OVER (PARTITION BY variable) AS left
FROM melt
""",
    "o05_conditional_agg": f"""
{_G_SQL}
SELECT variable, round(threshold, 6) AS threshold,
       round(left_p1, 6) AS left_p1, round(right_p1, 6) AS right_p1
FROM g
""",
    "o06_split_scores": f"""
{_G_SQL}
SELECT variable, round(threshold, 6) AS threshold,
       round(left_p1, 6) AS left_p1, round(right_p1, 6) AS right_p1,
       round({_METRIC_SQL}, 6) AS metric
FROM g
""",
    "o06b_split_scores_median_gini": f"""
WITH {BASE_SQL},
{MELT_SQL},
med AS (
  SELECT variable, quantile_cont(value, 0.5) AS threshold
  FROM melt GROUP BY variable
),
g AS (
  SELECT m.variable, med.threshold,
         COALESCE(AVG(CASE WHEN m.value <= med.threshold THEN m.class END), 0.0) AS left_p1,
         COALESCE(AVG(CASE WHEN m.value > med.threshold THEN m.class END), 0.0) AS right_p1
  FROM melt m JOIN med ON m.variable = med.variable
  GROUP BY m.variable, med.threshold
)
SELECT variable, round(threshold, 6) AS threshold,
       round(left_p1, 6) AS left_p1, round(right_p1, 6) AS right_p1,
       round((1.0 - (1.0-left_p1)*(1.0-left_p1) - left_p1*left_p1)
           + (1.0 - (1.0-right_p1)*(1.0-right_p1) - right_p1*right_p1), 6) AS metric
FROM g
""",
    "o07_best_split": f"""
{_G_SQL}
SELECT variable, round(threshold, 6) AS threshold,
       round({_METRIC_SQL}, 6) AS metric
FROM g
ORDER BY {_METRIC_SQL} ASC, variable ASC
LIMIT 1
""",
    "o08_majority": f"""
WITH {BASE_SQL}
SELECT class AS label, CAST(count(*) AS BIGINT) AS cnt
FROM base GROUP BY class
ORDER BY cnt DESC, label ASC
LIMIT 1
""",
    "o09_constant_label": """
SELECT l_orderkey, l_linenumber, CAST(1 AS TINYINT) AS prediction FROM lineitem
""",
    "o11_tree_inference": """
SELECT l_orderkey, l_linenumber,
       CAST(CASE WHEN l_discount <= 0.05 THEN 0
                 ELSE CASE WHEN l_quantity <= 25.0 THEN 0 ELSE 1 END
            END AS TINYINT) AS prediction
FROM lineitem
""",
    "o12_scalar_stats": f"""
WITH {BASE_SQL}
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(class) AS BIGINT) AS n1,
       round(avg(class), 6) AS p1,
       round({_h_sql('avg(class)')}, 6) AS entropy
FROM base
""",
    # O-13: the full fit IS SQL-expressible for the gate's FIXED
    # depth-3 mean/entropy configuration — each level's split search
    # is the o05-o07 program grouped by node path (r7, judge task 1).
    "tree_fit_transform": f"""WITH {BASE_SQL},
{_tree_train_cte('tf_', '')},
{_apply_cte(['tf_'])}
SELECT a.l_orderkey, a.l_linenumber, CAST(l.pred AS TINYINT) AS prediction
FROM ap3 a JOIN tf_leaf l ON a.p0 = l.p
""",
    # E-12 CART regression tree (r7): level-wise variance-reduction
    # derivation + row-local routing; predictions are 6dp leaf means.
    "rtree_fit_transform": f"""WITH {BASE_SQL},
{_rtree_cte_sql('rt_', depth=2)}
SELECT r.l_orderkey, r.l_linenumber, l.pred AS prediction
FROM rt_r2 r JOIN rt_leaf l ON r.p = l.p
""",
    # E-12b gradient boosting (r7): 3 squared-error stages of the
    # depth-2 regression tree on running residuals, lr=0.5 (exact
    # binary), final prediction rounded to 6dp.
    "gbt_fit_transform": f"""WITH {BASE_SQL},
{_gbt_cte_sql(n_trees=3, depth=2, lr=0.5)}
SELECT l_orderkey, l_linenumber, round(fhat, 6) AS prediction
FROM gb3
""",
    "tree_fit_median_gini": f"""WITH {BASE_SQL},
{_tree_train_cte('mg_', '', depth=2, thr_sql='quantile_cont(value, 0.5)',
                 metric_name='gini')},
{_apply_cte(['mg_'], depth=2)}
SELECT a.l_orderkey, a.l_linenumber, CAST(l.pred AS TINYINT) AS prediction
FROM ap2 a JOIN mg_leaf l ON a.p0 = l.p
""",
    # Bagged 3-tree forest: three tree derivations on deterministic
    # md5-sampled subsets (forest.py:72-97), one row-local routing
    # stack through all three decision tables, majority vote = sum of
    # votes strictly over half (forest.py:101-113).
    "forest_fit_transform": f"""WITH {BASE_SQL},
{_tree_train_cte('f0_', _bag_where_sql('gate|0', 0.7))},
{_tree_train_cte('f1_', _bag_where_sql('gate|1', 0.7))},
{_tree_train_cte('f2_', _bag_where_sql('gate|2', 0.7))},
{_apply_cte(['f0_', 'f1_', 'f2_'])}
SELECT a.l_orderkey, a.l_linenumber,
       CAST((l0.pred + l1.pred + l2.pred) * 2 > 3 AS TINYINT) AS prediction
FROM ap3 a
JOIN f0_leaf l0 ON a.p0 = l0.p
JOIN f1_leaf l1 ON a.p1 = l1.p
JOIN f2_leaf l2 ON a.p2 = l2.p
""",
    # r7 χ² feature selection: document-presence contingency per
    # observed (label, token), N(AD-BC)²/((A+B)(C+D)(A+C)(B+D)),
    # top-10 per label; everywhere-tokens/labels excluded (zero
    # marginal). Integer-derived doubles — exact cross-engine.
    # r7 closed-form linear regression (token-count estimator):
    # integer-exact Gram moments, then the SAME Cramer expression
    # tree as linreg_fit (do not reassociate — the coefficients must
    # match the Python solve bit-for-bit, not just to 6dp).
    "linreg_fit_transform": f"""
WITH feats AS (
  SELECT doc_id, n_chars AS chars,
         CAST(length(text)
              - length(regexp_replace(text, '[aeiou]', '', 'g'))
              AS INT) AS vowels,
         CAST(len(list_filter({TOKS_SQL}, t -> t <> '')) AS INT)
           AS n_tokens
  FROM documents
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(n_tokens AS BIGINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(chars AS BIGINT)) AS DOUBLE) AS sx1,
         CAST(sum(CAST(vowels AS BIGINT)) AS DOUBLE) AS sx2,
         CAST(sum(CAST(chars AS BIGINT) * CAST(n_tokens AS BIGINT))
              AS DOUBLE) AS s1y,
         CAST(sum(CAST(vowels AS BIGINT) * CAST(n_tokens AS BIGINT))
              AS DOUBLE) AS s2y,
         CAST(sum(CAST(chars AS BIGINT) * CAST(chars AS BIGINT))
              AS DOUBLE) AS s11,
         CAST(sum(CAST(chars AS BIGINT) * CAST(vowels AS BIGINT))
              AS DOUBLE) AS s12,
         CAST(sum(CAST(vowels AS BIGINT) * CAST(vowels AS BIGINT))
              AS DOUBLE) AS s22
  FROM feats
),
gd AS (
  SELECT *,
         n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)
           + sx2*(sx1*s12 - s11*sx2) AS det
  FROM g
),
w AS (
  SELECT
    (sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)
       + sx2*(s1y*s12 - s11*s2y)) / det AS w0,
    (n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)
       + sx2*(sx1*s2y - s1y*sx2)) / det AS w1,
    (n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)
       + sy*(sx1*s12 - s11*sx2)) / det AS w2
  FROM gd
)
SELECT doc_id, chars, vowels, n_tokens,
       round(w.w0 + w.w1*CAST(chars AS DOUBLE)
                  + w.w2*CAST(vowels AS DOUBLE), 6) AS est_tokens,
       round(CAST(n_tokens AS DOUBLE)
             - round(w.w0 + w.w1*CAST(chars AS DOUBLE)
                          + w.w2*CAST(vowels AS DOUBLE), 6), 6) AS resid
FROM feats CROSS JOIN w
""",
}
