"""The r10 Spark SQL text-feature expressions must be bit-equal to their
scalar references in functions.text on real corpus data AND on crafted
edge cases (empty/null text, punctuation-wrapped stopwords, boundary
mean word lengths, multi-language markers, unicode)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sprintz_spark.functions.text import (
    fingerprint,
    fingerprint_expr,
    lang_id,
    lang_id_expr,
    quality_score,
    quality_score_expr,
    token_count_bpe,
    token_count_bpe_expr,
)

EDGE_TEXTS = [
    None,
    "",
    " ",
    "the",
    ".the, AND? of; with:",
    "a b c d e f",  # mean_wl = 1 -> 0.5 wl term
    "abc def ghi",  # mean_wl = 3.0 boundary
    "abcdefghij " * 4,  # mean_wl = 10.0 boundary
    "der und die mit le et les avec",  # de vs fr tie -> first strict max
    "的是在和 the and of with",
    "x" * 500,
    "word " * 100,
    "The  quick\tbrown\nfox. 123 ?! #tag",
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    edge = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    return [docs.select("doc_id", "text"), edge]


def _check(df, expr_sql, scalar, bitwise_double=False):
    pdf = df.select("text", F.expr(expr_sql).alias("e")).toPandas()
    ref = pdf["text"].map(lambda t: scalar(t or ""))
    if bitwise_double:
        assert (
            pdf["e"].to_numpy().view(np.int64)
            == ref.to_numpy(np.float64).view(np.int64)
        ).all()
    else:
        assert (pdf["e"] == ref).all()


def test_lang_id_expr(frames):
    for df in frames:
        _check(df, lang_id_expr("text"), lang_id)


def test_quality_score_expr(frames):
    for df in frames:
        _check(df, quality_score_expr("text"), quality_score, bitwise_double=True)


def test_token_count_bpe_expr(frames):
    for df in frames:
        _check(df, token_count_bpe_expr("text"), token_count_bpe)


def test_fingerprint_expr(frames):
    for df in frames:
        _check(df, fingerprint_expr("text"), fingerprint)
