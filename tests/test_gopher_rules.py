"""Gopher rule battery (textstats.gopher_rules): hand-computed stats
on crafted documents exercising every rule, null/empty handling, and
the one-scan/no-shuffle plan pin.
"""

from __future__ import annotations

from decision_tree_stuff_spark.operators.textstats import gopher_rules


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df, **kw).collect()}


def test_word_count_and_stopword_rules(spark):
    out = _rows(
        spark,
        [
            (0, "the cat sat on a mat for it is that"),  # 10 words, many stops
            (1, "cat mat"),                              # too short
            (2, "cat sat mat pat hat rat bat fat vat tat"),  # no stopwords
        ],
        min_words=5,
    )
    assert out[0]["keep"] is True
    assert out[1]["r_word_count"] is False and out[1]["keep"] is False
    assert out[2]["r_stopwords"] is False and out[2]["keep"] is False
    assert out[0]["n_words"] == 10 and out[0]["stop_hits"] >= 2


def test_mean_word_len_and_alpha_rules(spark):
    out = _rows(
        spark,
        [
            # mean length (2+3+28)/3 = 11 > 10 -> fails
            (0, "to the incomprehensibilitiesxxxxxxxx"),
            # 4/5 words numeric -> alpha frac 0.2 < 0.8 -> fails
            (1, "the 12 34 56 78"),
        ],
        min_words=1,
        min_stop_hits=1,
    )
    assert out[0]["r_mean_word_len"] is False
    assert out[1]["r_alpha_words"] is False
    assert out[1]["alpha_word_frac"] == 0.2


def test_symbol_ratio_counts_hashes_and_ellipses(spark):
    out = _rows(
        spark,
        [(0, "the top # tag ## done ... fine")],
        min_words=1,
        min_stop_hits=1,
    )
    # 7 words ('#'/'##'/'...' are tokens too: 3+1+3... tokens split on
    # whitespace -> ['the','top','#','tag','##','done','...','fine'] = 8
    # hashes: 3, ellipses: 1 -> ratio (3 + 1) / 8 = 0.5 -> fails 0.1 cap
    assert out[0]["symbol_word_ratio"] == 0.5
    assert out[0]["r_symbol_ratio"] is False


def test_line_shape_rules(spark):
    bullets = "\n".join(["- item one", "- item two", "* item three", "tail"])
    trailing = "\n".join(["so it begins...", "and it ends..."])
    out = _rows(
        spark,
        [(0, bullets), (1, trailing)],
        min_words=1,
        min_stop_hits=0,
        max_bullet_line_frac=0.5,
    )
    assert out[0]["bullet_line_frac"] == 0.75
    assert out[0]["r_line_shape"] is False
    assert out[1]["ellipsis_line_frac"] == 1.0
    assert out[1]["r_line_shape"] is False


def test_null_and_empty_text(spark):
    out = _rows(spark, [(0, None), (1, "   "), (2, "")], min_words=1)
    # null text -> null stats, keep coalesced to False
    assert out[0]["n_words"] is None and out[0]["keep"] is False
    # empty/whitespace -> zero words -> fails min_words
    assert out[1]["n_words"] == 0 and out[1]["keep"] is False
    assert out[2]["keep"] is False


def test_gopher_rules_is_one_scan_no_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(gopher_rules(docs))
    assert "Exchange" not in plan, "gopher_rules must be a pure projection"
    assert "Scan parquet" in plan
