"""Pin shingled_frame (compiled-JVM NGram shingling, r12) against the
expression-level reference implementation word_ngrams.

The r12 optimization replaced the interpreted
``transform(idx, i -> array_join(slice(words, i+1, n), ' '))`` HOF —
which Catalyst evaluates expression-at-a-time per element and never
codegens — with pyspark.ml NGram's compiled Scala UDF. Every dedup /
decontamination operator's candidate generation rides on the two
producing EXACTLY the same (doc_id, grams) rows, so this test compares
them row-by-row and element-by-element (positional array order
included) on the real corpus and on hand-built edge cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.dedup import shingled_frame, word_ngrams
from spark_sql_server_spark.session import load_table

from tests.conftest import SF_SMOKE


def _reference(docs, n):
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id", F.array_distinct(word_ngrams(words, n)).alias("grams")
    ).filter(F.size(words) >= n)


def _as_map(df):
    return {r["doc_id"]: list(r["grams"]) for r in df.collect()}


@pytest.mark.parametrize("n", [3, 8, 20])
def test_shingled_frame_matches_reference_on_corpus(spark, n):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = _as_map(shingled_frame(docs, n))
    want = _as_map(_reference(docs, n))
    assert got == want
    assert got, "corpus produced no shingled rows — vacuous comparison"


def test_shingled_frame_edge_cases(spark):
    rows = [
        (1, "a b c d"),  # normal
        (2, "a b c"),  # exactly n words
        (3, "a b"),  # fewer than n words -> dropped
        (4, ""),  # empty string -> [''] (1 word) -> dropped
        (5, None),  # NULL text -> dropped (same as the reference)
        (6, "a  b c d"),  # double space -> empty-string word, kept verbatim
        (7, "x y z x y z x y z"),  # duplicate grams -> array_distinct
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _as_map(shingled_frame(docs, 3))
    want = _as_map(_reference(docs, 3))
    assert got == want
    assert sorted(got) == [1, 2, 6, 7]
    assert got[2] == ["a b c"]
    assert got[6] == ["a  b", " b c", "b c d"]
    assert got[7] == ["x y z", "y z x", "z x y"]
