"""URL canonicalization (textstats.normalize_urls, r13): the
RefinedWeb/CCNet-style normalize-before-dedup step — golden cases,
param-order invariance, tracking-param semantics, non-URL nulls."""

from __future__ import annotations

from decision_tree_stuff_spark.operators.textstats import normalize_urls


def _canon(spark, urls, **kw):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id int, url string"
    )
    return [
        r["url_canonical"]
        for r in normalize_urls(df, **kw).orderBy("doc_id").collect()
    ]


def test_normalize_urls_golden(spark):
    got = _canon(spark, [
        "HTTP://WWW.ExAmple.COM:80/Path/One?utm_source=x&b=2&a=1#Sec",
        "https://Example.com:443/p?a=1&utm_campaign=y&b=2",
        "https://example.com:8080/p?b=2&a=1",   # non-default port kept
        "http://example.com/",
        "not a url",
        "ftp://Files.Example.com/Data",          # other scheme: port rules off
        "https://example.com/p?utm_source=x",    # all params tracking -> no '?'
        None,
        "  https://example.com/x  ",             # surrounding whitespace
        "https://example.com/CaseSensitive/Path",  # path case KEPT
    ])
    assert got == [
        "http://example.com/Path/One?a=1&b=2",
        "https://example.com/p?a=1&b=2",
        "https://example.com:8080/p?a=1&b=2",
        "http://example.com/",
        None,
        "ftp://files.example.com/Data",
        "https://example.com/p",
        None,
        "https://example.com/x",
        "https://example.com/CaseSensitive/Path",
    ]


def test_normalize_urls_param_order_and_variants_collapse(spark):
    variants = [
        "https://example.com/p?a=1&b=2",
        "https://Example.com/p?b=2&a=1",
        "HTTPS://WWW.example.com:443/p?a=1&utm_medium=z&b=2#frag",
        "https://example.com:443/p?fbclid=abc&b=2&a=1",
        "https://example.com/p?gclid=x&msclkid=y&a=1&b=2",
    ]
    got = set(_canon(spark, variants))
    assert got == {"https://example.com/p?a=1&b=2"}


def test_normalize_urls_strip_www_off(spark):
    got = _canon(
        spark, ["http://WWW.Example.com/a"], strip_www=False
    )
    assert got == ["http://www.example.com/a"]


def test_normalize_urls_tracking_param_value_not_key(spark):
    # a param whose VALUE mentions utm must survive; only keys match
    got = _canon(spark, ["https://e.com/p?q=utm_source&a=1"])
    assert got == ["https://e.com/p?a=1&q=utm_source"]


def test_pii_scrub_planted_golden(spark):
    """The e4_pii_scrub planting recipe on a tiny frame: counts and
    redactions per category."""
    from pyspark.sql import functions as F

    from decision_tree_stuff_spark.operators.textstats import (
        scrub_documents,
    )

    df = spark.createDataFrame(
        [(3, "hello world"), (4, "ping host"), (5, "the file")],
        "doc_id int, text string",
    )
    mid = F.col("doc_id")
    extra = (
        F.when(mid % 3 == 0, F.concat(
            F.lit(" contact user"), mid.cast("string"),
            F.lit("@mail.example.com now")))
        .when(mid % 3 == 1, F.concat(
            F.lit(" from 10."), (mid % 200).cast("string"),
            F.lit(".0.1 logged")))
        .otherwise(F.concat(
            F.lit(" ssn "), (mid % 900 + 100).cast("string"), F.lit("-"),
            (mid % 90 + 10).cast("string"), F.lit("-"),
            (mid % 9000 + 1000).cast("string"), F.lit(" filed")))
    )
    planted = df.select("doc_id", F.concat("text", extra).alias("text"))
    out = {r["doc_id"]: r for r in scrub_documents(planted).collect()}
    assert out[3]["text"] == "hello world contact <EMAIL> now"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_ssn"]) == (1, 0, 0)
    assert out[4]["text"] == "ping host from <IP> logged"
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_ssn"]) == (0, 1, 0)
    assert out[5]["text"] == "the file ssn <ID> filed"
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_ssn"]) == (0, 0, 1)
