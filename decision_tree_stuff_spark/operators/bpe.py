"""Byte-pair-encoding tokenizer training and encoding (E-4bpe):
Sennrich et al. 2016's subword vocabulary learner, the step a
training-data pipeline runs between corpus curation and token
counting/packing.

Representation: a segmentation is a DOUBLE-SPACE-delimited symbol
string (``'  h  e  y  '`` — two spaces at the boundaries too), so
applying a merge (a, b)→ab is one literal
``replace(seg, ' a  b ', ' ab ')``: the pattern consumes ONE of the
two spaces on each side and the replacement restores it. That
single-space margin is what makes plain ``replace`` (non-overlapping,
left-to-right, scanning resumes AFTER each substitution — the
semantics Spark's ``UTF8String.replace`` and DuckDB's ``replace``
share) exactly canonical greedy BPE application: adjacent pattern
occurrences (``the the``, ``aaaa`` under (a,a)) do not share a
delimiter, so none is skipped. A single-space scheme gets this wrong —
the trailing space of one match is the leading space of the next, and
runs under-merge. Verified against a pure-Python reference BPE in
tests/test_bpe.py.

Scale design:
  * training runs on the WORD-TYPE table (distinct word, frequency) —
    one corpus-sized shuffle builds it, after which every merge
    iteration touches only vocabulary rows (web-scale: ~10M types vs
    trillions of tokens). Per iteration: one pair-count aggregate
    (map-side combined) and a 1-row argmax collect; the segmentation
    update is a projection. Counts are integer sums, ties break
    lexicographically — training is bit-deterministic, so the DuckDB
    twin unrolls the same iterations as CTEs and matches exactly.
  * encoding is a PURE PROJECTION over documents: the doc is spaced
    per character with a ``|`` guard symbol between words (no merge
    pattern can contain the guard, so merges cannot cross word
    boundaries), the learned merges are applied in rank order as a
    chain of literal replaces, and the token array falls out of one
    split. Zero shuffles, zero joins — at 100 TB the cost is the scan.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

from decision_tree_stuff_spark.functions.text import tokens

SEP = "  "  # two spaces between adjacent symbols (and at boundaries)


def _spaced(word):
    """'abc' -> 'a  b  c  ' (every char followed by two spaces)."""
    return F.regexp_replace(word, "(.)", "$1" + SEP)


def _pattern(left: str, right: str) -> str:
    return f" {left}{SEP}{right} "


def _replacement(merged: str) -> str:
    return f" {merged} "


def bpe_train(
    docs: DataFrame,
    n_merges: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache: bool = True,
    score: str = "count",
) -> List[Tuple[int, str, str, str]]:
    """Learn ``n_merges`` merges from the corpus.

    ``score='count'`` is canonical BPE (Sennrich et al. 2016: merge
    the most frequent pair). ``score='likelihood'`` is the WordPiece
    criterion (Schuster & Nakajima 2012, the BERT tokenizer): merge
    the pair maximizing ``count(a,b) / (count(a) * count(b))`` — the
    pair whose merge most increases corpus likelihood under a unigram
    symbol model. Same segmentation mechanics, same portable merge
    table, one extra vocab-sized symbol-count aggregate per iteration.
    The ratio is exact double division of integer counts, so the
    DuckDB twin's argmax walks identical doubles — training stays
    bit-deterministic (ties break on pair-string ASC).

    Returns ``[(rank, left, right, merged), ...]`` in application
    order (rank 1 first). Stops early if no adjacent pair remains.

    ``cache=True`` persists the word-type table for the duration of
    training: each iteration's pair-count action otherwise replays the
    full corpus word count through the lazy lineage — iters extra
    corpus scans for a frame that is vocabulary-sized by construction.
    (The per-iteration replace chain still replays over the cached
    rows; that is vocab-sized work and cheap.)
    """
    assert score in ("count", "likelihood"), score
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(
            F.concat(F.lit(SEP), _spaced(F.col("word"))).alias("seg"), "f"
        )
    )
    if cache:
        from pyspark import StorageLevel

        words = words.persist(StorageLevel.MEMORY_AND_DISK)
    merges: List[Tuple[int, str, str, str]] = []
    cur = words
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("seg")), SEP)
        pairs = F.expr(
            "transform(slice(__s, 1, greatest(size(__s) - 1, 0)),"
            f" (x, i) -> concat(x, '{SEP}', element_at(__s, i + 2)))"
        )
        pc = (
            cur.select(F.col("f"), syms.alias("__s"))
            .select(F.col("f"), F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("f").alias("c"))
        )
        if score == "likelihood":
            sc = (
                cur.select(F.col("f"), syms.alias("__s"))
                .select(F.col("f"), F.explode(F.col("__s")).alias("sym"))
                .groupBy("sym")
                .agg(F.sum("f").alias("cs"))
            )
            pc = (
                pc.withColumn("__l", F.split(F.col("pair"), SEP)[0])
                .withColumn("__r", F.split(F.col("pair"), SEP)[1])
                .join(
                    sc.select(
                        F.col("sym").alias("__l"), F.col("cs").alias("cl")
                    ),
                    "__l",
                )
                .join(
                    sc.select(
                        F.col("sym").alias("__r"), F.col("cs").alias("cr")
                    ),
                    "__r",
                )
            )
            order = [
                (
                    F.col("c").cast("double")
                    / (F.col("cl") * F.col("cr"))
                ).desc(),
                F.col("pair").asc(),
            ]
        else:
            order = [F.col("c").desc(), F.col("pair").asc()]
        top = pc.orderBy(*order).limit(1).collect()
        if not top:
            break
        pair = top[0]["pair"]
        left, right = pair.split(SEP, 1)
        merged = left + right
        merges.append((rank, left, right, merged))
        cur = cur.select(
            F.replace(
                F.col("seg"),
                F.lit(_pattern(left, right)),
                F.lit(_replacement(merged)),
            ).alias("seg"),
            "f",
        )
    if cache:
        words.unpersist()
    return merges


def bpe_merge_table(
    spark, merges: List[Tuple[int, str, str, str]]
) -> DataFrame:
    """The portable (rank, left, right, merged) model table."""
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string"
    )


def bpe_encode(
    docs: DataFrame,
    merges: List[Tuple[int, str, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with a learned merge list — ONE
    shuffle-free projection.

    The document is spaced per character with a ``'|'`` guard symbol
    between words, the merges are applied in rank order as literal
    replaces, and the BPE tokens are the non-guard symbols of the
    final segmentation.

    Returns (id, n_tokens_bpe, encoded) where ``encoded`` is the
    space-joined token sequence. Null text propagates nulls; empty
    text encodes to 0 tokens and an empty string.
    """
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    seg = F.concat(
        F.lit(SEP),
        F.array_join(F.transform(toks, lambda w: _spaced(w)), "|" + SEP),
    )
    for _, left, right, merged in merges:
        seg = F.replace(
            seg, F.lit(_pattern(left, right)), F.lit(_replacement(merged))
        )
    out_toks = F.filter(
        F.split(F.trim(seg), SEP),
        lambda t: (t != "") & (t != "|"),
    )
    return docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("int"))
        .otherwise(F.size(out_toks))
        .alias("n_tokens_bpe"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.array_join(out_toks, " "))
        .alias("encoded"),
    )
