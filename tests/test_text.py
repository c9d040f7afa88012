"""Unit tests for text-analysis operators (token counting, decontamination).

The contract queries in __spark_entry__ cover these against DuckDB twins at
sf scale; these tests pin hand-computed expectations on tiny inputs so a
regex or join-shape change can't silently shift semantics on both engines
at once.
"""

from __future__ import annotations

import re

from mvt_wrangler_spark.operators.text import (BPE_TOKEN_RE, decontaminate,
                                               token_counts)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_token_counts_hand_computed(spark):
    docs = [
        (1, "hello world"),                 # 2 ws, 2 bpe (' ?letters' twice)
        (2, "it's 2026, really!"),          # bpe: it |'s | 2 | 026 | , | really | !
        (3, "   "),                         # ws split of trim("") -> [""] size 1
        (4, "a\tb\nc"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = _rows(token_counts(df))

    # Cross-check the bpe column against Python re (same leftmost-first
    # alternation semantics as java.util.regex for this pattern).
    pat = re.compile(BPE_TOKEN_RE)
    for doc_id, text in docs:
        assert got[doc_id]["n_bpe_tokens"] == len(pat.findall(text)), text

    assert got[1]["n_ws_tokens"] == 2
    assert got[2]["n_ws_tokens"] == 3
    assert got[3]["n_ws_tokens"] == 1  # split(trim) on all-space -> [""]
    assert got[4]["n_ws_tokens"] == 3
    assert got[2]["n_bpe_tokens"] == 7


def test_bpe_regex_digit_chunking(spark):
    # Long numbers split into <=3-digit chunks; leading space binds.
    df = spark.createDataFrame([(1, "x 1234567")], ["doc_id", "text"])
    got = _rows(token_counts(df))
    # tokens: 'x', ' 123', '456', '7'
    assert got[1]["n_bpe_tokens"] == 4


def test_decontaminate_hand_computed(spark):
    # shingle=3 char-grams. eval doc "abcdef" has distinct 3-grams
    # {abc,bcd,cde,def}. train doc 1 shares abc,bcd; doc 2 none; doc 3
    # shorter than the shingle -> zero shingles -> 0 hits, kept.
    train = spark.createDataFrame(
        [(1, "xabcdx"), (2, "zzzzzz"), (3, "ab")], ["doc_id", "text"])
    ev = spark.createDataFrame([(100, "abcdef")], ["doc_id", "text"])
    got = _rows(decontaminate(train, ev, shingle=3))
    assert got[1]["n_hits"] == 2 and got[1]["contaminated"]
    assert got[2]["n_hits"] == 0 and not got[2]["contaminated"]
    assert got[3]["n_hits"] == 0 and not got[3]["contaminated"]
    assert len(got) == 3  # every train doc present, matched or not


def test_decontaminate_shuffle_path_matches_broadcast(spark):
    train = spark.createDataFrame(
        [(i, f"doc number {i} with shared tail abcdefgh") for i in range(20)],
        ["doc_id", "text"])
    ev = spark.createDataFrame([(99, "tail abcdefgh end")], ["doc_id", "text"])
    a = sorted(decontaminate(train, ev, shingle=8, broadcast_eval=True).collect())
    b = sorted(decontaminate(train, ev, shingle=8, broadcast_eval=False).collect())
    assert a == b
    assert all(r["n_hits"] > 0 for r in a)  # 'abcdefgh' & co shared by all
