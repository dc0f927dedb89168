"""Parity pin: the vectorized md5 MinHash kernel must equal the pure
column-algebra formulation bit-for-bit — including the ASCII packed-key
fast path, the non-ASCII slow path, empty and shorter-than-k documents,
and NULL text (coalesced to '')."""

from __future__ import annotations

import pytest

from nfl_feature_store_spark.operators.dedup import (
    _minhash_signature_md5_expr,
    minhash_signature,
)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, ""),                      # empty -> single '' shingle
    (3, None),                    # NULL -> coalesced to ''
    (4, "ab"),                    # shorter than k -> whole text is the gram
    (5, "abcde"),                 # exactly k
    (6, "AbCdE FgHiJ"),           # lowercasing happens before shingling
    (7, "naïve café déjà vu — franchise"),   # non-ASCII slow path
    (8, "日本語のテキストです、五文字のシングル"),  # multi-byte slow path
    (9, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


def _collect(df):
    return {r["id"]: list(r["sig"]) for r in df.collect()}


def test_kernel_matches_expr_formulation(spark, corpus_df):
    expr = _collect(_minhash_signature_md5_expr(corpus_df, "doc_id", "text", 16, 5))
    kern = _collect(minhash_signature(corpus_df, "doc_id", "text", 16, 5, hash_fn="md5"))
    assert kern == expr


def test_kernel_matches_expr_other_shapes(spark, corpus_df):
    # different num_hashes / shingle_k exercise the seed strings and the
    # short-doc boundary at a different k
    expr = _collect(_minhash_signature_md5_expr(corpus_df, "doc_id", "text", 8, 3))
    kern = _collect(minhash_signature(corpus_df, "doc_id", "text", 8, 3, hash_fn="md5"))
    assert kern == expr


def test_kernel_k_above_packed_limit_falls_back(spark, corpus_df):
    # k > 8 bytes cannot use the packed-uint64 fast path; the slow path
    # must still agree with the expression form
    expr = _collect(_minhash_signature_md5_expr(corpus_df, "doc_id", "text", 4, 9))
    kern = _collect(minhash_signature(corpus_df, "doc_id", "text", 4, 9, hash_fn="md5"))
    assert kern == expr


def test_winnow_table_matches_expr(spark, corpus_df):
    """winnow_fingerprints_table (md5 kernel) must equal the column-expr
    form element-for-element, including array_distinct's first-occurrence
    order, short/empty docs and the non-ASCII slow path."""
    from pyspark.sql import functions as F

    from nfl_feature_store_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_table,
    )

    for k, w in ((8, 4), (5, 3), (9, 4)):
        expr = {
            r["doc_id"]: list(r["fps"])
            for r in corpus_df.select(
                "doc_id", winnow_fingerprints("text", k=k, w=w, hash_fn="md5").alias("fps")
            ).collect()
        }
        kern = {
            r["doc_id"]: list(r["fps"])
            for r in winnow_fingerprints_table(
                corpus_df, "doc_id", "text", k=k, w=w, hash_fn="md5"
            ).collect()
        }
        assert kern == expr, f"k={k} w={w}"


def test_winnow_table_xxhash_falls_back_to_expr(spark, corpus_df):
    from nfl_feature_store_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_table,
    )

    expr = {
        r["doc_id"]: list(r["fps"])
        for r in corpus_df.select(
            "doc_id", winnow_fingerprints("text", k=8, w=4).alias("fps")
        ).collect()
    }
    kern = {
        r["doc_id"]: list(r["fps"])
        for r in winnow_fingerprints_table(corpus_df, "doc_id", "text", k=8, w=4).collect()
    }
    assert kern == expr
