"""Registry contract (r9, after the queries/ package split): the
driver records CORRECTNESS for the FIRST 50 keys of SPARK_QUERIES, so
the gate's composition AND order are a contract — pin them, so a
refactor (or an accidental dict edit) can never silently change what
the driver checks. Rotations must edit this snapshot deliberately,
alongside GATE_ROTATION.md.

Most tests here are import-time metadata; the gate-schema contract
(r10) builds the 50 gate plans at sf0.001 and needs the session
Spark fixture.
"""

import os

from decision_tree_stuff_spark.queries import (
    ALL_ORACLE_SQL,
    ALL_QUERIES,
    EXTRA_PARITY_ORACLE_SQL,
    EXTRA_PARITY_QUERIES,
    ORACLE_SQL,
    SPARK_QUERIES,
)

# The exact 50-key gate window, in driver order (r12 rotation —
# GATE_ROTATION.md has the swap history).
GATE_KEYS = [
    "o01_filter_split",
    "o02_unpivot",
    "o03_window_threshold",
    "o05_conditional_agg",
    "o06_split_scores",
    "o07_best_split",
    "o08_majority",
    "o11_tree_inference",
    "o12_scalar_stats",
    "tree_fit_transform",
    "forest_fit_transform",
    "e1_exact_dedup",
    "e2_edit_verified",
    "e2_jaccard_pairs",
    "e7_dedup_clusters",
    "e7b_minhash_dedup_keep",
    "e10_asof_join",
    # r15 rotation (GATE_ROTATION.md): e4_pii_scrub, e6_gif_decode in;
    # e2_minhash_km_pairs, e6_y4m_decode out
    "e4_pii_scrub",
    "e1d_span_dedup",
    "e4_hll_distinct",
    "e6_gif_decode",
    "e4_lm_quality",
    "e3_cosine_topk",
    "e2_simhash_md5_dups",
    "e3_ivf_topk",
    "e9_decontamination",
    "e8_sample",
    "e8_hash_split",
    "e12_batch_ingest",
    "e6_pixel_decode_paletted",
    # r14 rotation (GATE_ROTATION.md): e4_hist_rebucket_merge,
    # e4_hist_quantiles_auto_weighted, e6_png_fixed_decode in;
    # e5_sessions, e4_corpus_profile, e9d_contamination_spans out
    "e4_hist_rebucket_merge",
    "e4_hist_quantiles_auto_weighted",
    "e4_document_stats",
    "e4_hist_quantiles_auto",
    "e6_png_fixed_decode",
    "e4_quality_filter",
    "e6_media_meta",
    "e1f_exact_substring",
    "e4_hist_quantiles",
    "e13_validate",
    "e7d_pagerank",
    "e4_heavy_hitters",
    "e9c_semantic_decontam",
    "e14b_hilbert",
    "e6_pixel_decode",
    "skew_salted_agg",
    "rel_pricing_summary",
    "rel_disjunctive_join",
    "rel_rollup",
    "rel_top_customers",
]


def test_gate_window_is_pinned():
    assert list(SPARK_QUERIES) == GATE_KEYS
    assert len(SPARK_QUERIES) == 50


def test_every_gate_key_has_an_oracle():
    missing = [k for k in SPARK_QUERIES if k not in ORACLE_SQL]
    assert not missing, missing


def test_registries_are_disjoint_and_union_cleanly():
    assert not set(SPARK_QUERIES) & set(EXTRA_PARITY_QUERIES)
    assert set(ALL_QUERIES) == set(SPARK_QUERIES) | set(EXTRA_PARITY_QUERIES)
    assert not set(ORACLE_SQL) & set(EXTRA_PARITY_ORACLE_SQL)
    assert set(ALL_ORACLE_SQL) == set(ORACLE_SQL) | set(
        EXTRA_PARITY_ORACLE_SQL
    )


def test_query_fn_names_match_keys():
    # q_<key> naming keeps the registry greppable; a mismatched entry
    # is almost always a copy-paste error wiring a key to the wrong fn
    for k, fn in ALL_QUERIES.items():
        assert fn.__name__ == f"q_{k}", (k, fn.__name__)


def test_oracle_sql_is_nonempty_text():
    for k, sql in ALL_ORACLE_SQL.items():
        assert isinstance(sql, str) and sql.strip(), k


def _complex_fields(schema):
    from pyspark.sql.types import ArrayType, BinaryType, MapType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, BinaryType))
    ]


def test_gate_schemas_are_driver_canonicalizable(spark):
    """r10 (r9 verdict task 2): the driver's correctness harness
    canonicalizes result frames with pandas ``sort_values``, which
    cannot sort array/map cells and hashes binary differently per
    engine — so NO gate query may return an ArrayType / MapType /
    BinaryType column (hex-pack or explode instead; EXTRA-parity rows
    are exempt because the self-audit canonicalizer handles lists).
    This failed on the r9 `q_e6_pixel_decode` shape; rotation
    candidates must pass it BEFORE being promoted."""
    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    offenders = {}
    for key in GATE_KEYS:
        schema = SPARK_QUERIES[key](spark, sf_dir).schema
        bad = _complex_fields(schema)
        if bad:
            offenders[key] = bad
    assert not offenders, (
        f"gate queries returning pandas-unsortable columns: {offenders}"
    )
