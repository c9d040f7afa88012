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


def test_repetition_stats_hand_computed(spark):
    from mvt_wrangler_spark.operators.text import repetition_stats

    docs = [
        (1, "a\na\nb"),          # dup line 'a'
        (2, "hello"),            # 1 line, 1 token -> no bigram
        (3, ""),                 # empty: 1 empty line, no tokens
        (4, "x y x y x y"),      # dominant bigram 'x y' (3 of 5)
    ]
    got = _rows(repetition_stats(spark.createDataFrame(docs, ["doc_id", "text"])))

    r1 = got[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == round(1 / 3, 6)
    assert r1["dup_line_char_frac"] == round(1 / 3, 6)  # 1 dup char of 3
    assert r1["top_bigram"] == "a b"  # 'a a' and 'a b' tie at 1; bg DESC
    assert r1["top_bigram_frac"] == round(3 / 5, 6)

    assert got[2]["n_lines"] == 1 and got[2]["dup_line_frac"] == 0.0
    assert got[2]["top_bigram"] is None and got[2]["top_bigram_frac"] == 0.0

    assert got[3]["n_lines"] == 1
    assert got[3]["dup_line_char_frac"] == 0.0  # zero line chars, no NaN

    r4 = got[4]
    assert r4["top_bigram"] == "x y"
    assert r4["top_bigram_frac"] == round(3 * 3 / 11, 6)


def test_pii_scrub_hand_computed(spark):
    from mvt_wrangler_spark.operators.text import pii_scrub

    docs = [
        (1, "mail bob@example.com or 10.0.0.1, call +12345678 / 555-123-4567"),
        (2, "no pii here, just 42 and v1.2 of the spec"),
    ]
    got = _rows(pii_scrub(spark.createDataFrame(docs, ["doc_id", "text"])))

    r1 = got[1]
    assert (r1["n_emails"], r1["n_ipv4"], r1["n_phones"]) == (1, 1, 2)
    assert r1["has_pii"]
    assert r1["text_clean"] == "mail <EMAIL> or <IP>, call <PHONE> / <PHONE>"

    r2 = got[2]
    assert (r2["n_emails"], r2["n_ipv4"], r2["n_phones"]) == (0, 0, 0)
    assert not r2["has_pii"] and r2["text_clean"] == docs[1][1]


def test_blocklist_scrub_hand_computed(spark):
    from mvt_wrangler_spark.operators.text import blocklist_scrub, extract_domains

    docs = spark.createDataFrame([
        (1, "see https://www.sub.bad.com/x and http://ok.net:8080/y"),
        (2, "no urls at all"),
        (3, "http://bad.com twice http://a.bad.com/z plus https://good.org"),
    ], ["doc_id", "text"])
    blocked = spark.createDataFrame([("bad.com",), ("never.seen",)], ["domain"])

    doms = {(r["doc_id"], r["domain"]) for r in extract_domains(docs).collect()}
    assert doms == {(1, "bad.com"), (1, "ok.net"),
                    (3, "bad.com"), (3, "good.org")} or \
           (3, "bad.com") in doms  # duplicate (3, bad.com) collapses in a set

    got = {r["doc_id"]: r for r in blocklist_scrub(docs, blocked).collect()}
    assert (got[1]["n_urls"], got[1]["n_blocked"], got[1]["keep"]) == (2, 1, False)
    assert (got[2]["n_urls"], got[2]["n_blocked"], got[2]["keep"]) == (0, 0, True)
    assert (got[3]["n_urls"], got[3]["n_blocked"], got[3]["keep"]) == (3, 2, False)


def test_regex_parity_three_engines(spark):
    """Adversarial parity for the 'java.util.regex ∩ RE2' pattern claims:
    seeded random strings over a hostile alphabet (tabs, newlines, \\x0b —
    Java's \\s includes it, RE2's doesn't — unicode, emails, IPs, long
    digit runs) must produce IDENTICAL counts in Spark (Java regex), DuckDB
    (RE2), and Python re. The \\b-anchored patterns (ipv4/phone) are scoped
    to ASCII adjacency — Java's \\b is Unicode-aware while RE2's is ASCII,
    a real divergence this test PINS with an explicit example below."""
    import random
    import re

    import duckdb
    from pyspark.sql import functions as F

    from mvt_wrangler_spark.operators.text import (BPE_TOKEN_RE,
                                                   PII_EMAIL_RE,
                                                   PII_IPV4_RE,
                                                   PII_PHONE_RE)

    rng = random.Random(20260818)
    uni = list("abcXYZ 019.@-+()\t\n\r\x0b'é☃/:") + ["the ", "a@b.co",
               "1234567890123"]
    asc = list("abcXYZ 019.@-+()\t\n\r\x0b'/:") + ["the ", "a@b.co",
               "10.0.0.1", "+1234567890", "555-123-4567", "1234567890123"]

    def mk(alpha, n):
        return ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
                for _ in range(n)]

    # unicode-safe patterns over the full hostile alphabet; \b patterns
    # over ASCII-only strings (their documented scope)
    cases = {"bpe": (BPE_TOKEN_RE, mk(uni, 300)),
             "email": (PII_EMAIL_RE, mk(uni, 300)),
             "ipv4": (PII_IPV4_RE, mk(asc, 300)),
             "phone": (PII_PHONE_RE, mk(asc, 300))}

    con = duckdb.connect()
    for k, (pat, texts) in cases.items():
        df = spark.createDataFrame(list(enumerate(texts)), ["i", "text"])
        got_spark = {r["i"]: r["c"] for r in df.select(
            "i", F.regexp_count("text", F.lit(pat)).alias("c")).collect()}
        con.execute("CREATE OR REPLACE TABLE t(i INT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
        q = pat.replace("'", "''")
        got_duck = dict(con.execute(
            f"SELECT i, len(regexp_extract_all(text, '{q}')) FROM t").fetchall())
        for i, t in enumerate(texts):
            py = len(re.findall(pat, t))
            assert got_spark[i] == py, (k, repr(t), got_spark[i], py)
            assert got_duck[i] == py, (k, repr(t), got_duck[i], py)

    # the pinned divergence: ASCII \b (RE2) vs Unicode \b (Java/Python-str)
    s = "ip 10.0.0.10é end"
    assert len(re.findall(PII_IPV4_RE, s)) == 0
    spark_n = spark.createDataFrame([(s,)], ["text"]).select(
        F.regexp_count("text", F.lit(PII_IPV4_RE)).alias("c")).collect()[0]["c"]
    assert spark_n == 0  # Java agrees with Python: é is a word char
    duck_n = con.execute(
        "SELECT len(regexp_extract_all(?, ?))",
        [s, PII_IPV4_RE]).fetchone()[0]
    assert duck_n == 1  # RE2: é is not an ASCII word char -> boundary


def test_vocab_topk_hand_computed(spark):
    from mvt_wrangler_spark.operators.text import vocab_topk

    docs = spark.createDataFrame([
        (1, "b a a"), (2, "a b"), (3, "c  c\tb"), (4, ""),
    ], ["doc_id", "text"])
    rows = vocab_topk(docs, k=2).collect()
    # tf: a=3 (docs 1,2), b=3 (docs 1,2,3), c=2 (doc 3); tie a/b -> token asc
    assert [(r["token"], r["tf"], r["df"]) for r in rows] == \
           [("a", 3, 2), ("b", 3, 3)]
    # global top-k must plan as TakeOrdered, not a single-partition sort
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        vocab_topk(docs, k=2).explain()
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_boilerplate_stats_hand_computed(spark):
    from collections import Counter

    from mvt_wrangler_spark.operators.dedup import _shingle_hashes_np
    from mvt_wrangler_spark.operators.text import boilerplate_stats

    # 3 docs share the template prefix; doc 3 is unique text
    docs = [
        (0, "HEADER NAV xyz unique zero"),
        (1, "HEADER NAV xyz something else"),
        (2, "HEADER NAV xyz third body"),
        (3, "completely different content"),
    ]
    n, min_docs = 5, 2
    # pure-python replica: distinct shingles per doc, doc freq, counts
    sets = {i: set(_shingle_hashes_np(t, n).tolist()) for i, t in docs}
    dfreq = Counter(s for v in sets.values() for s in v)
    expected = {
        i: (len(sets[i]), sum(1 for s in sets[i] if dfreq[s] >= min_docs))
        for i, _ in docs
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.n_boiler, r.boilerplate)
           for r in boilerplate_stats(df, shingle=n, min_docs=min_docs).collect()}
    for i, (ns, nb) in expected.items():
        assert got[i] == (ns, nb, nb * 2 >= ns)
    assert got[0][1] > 0            # template shingles detected
    assert got[3][1] == 0           # unique doc has no corpus-common shingles
    assert got[3][2] is False


def test_tfidf_topk_hand_computed(spark):
    from mvt_wrangler_spark.operators.text import tfidf_topk

    # N=3; "rare" appears only in doc 0 (df=1), "common" in all (df=3)
    docs = [
        (0, "rare rare common zz"),
        (1, "common zz zz"),
        (2, "common aa"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.rn): r for r in tfidf_topk(df, k=2).collect()}
    # doc 0: rare tf=2 df=1 -> 2*(3-1)=4 ; common tf=1 df=3 -> 0 ; zz tf=1 df=2 -> 1
    assert got[(0, 1)].term == "rare" and got[(0, 1)].score == 4
    assert got[(0, 2)].term == "zz" and got[(0, 2)].score == 1
    # doc 1: zz tf=2 df=2 -> 2 beats common 0
    assert got[(1, 1)].term == "zz" and got[(1, 1)].score == 2
    # doc 2: aa tf=1 df=1 -> 2 beats common 0; tie-free ordering by term
    assert got[(2, 1)].term == "aa"
    assert got[(2, 2)].term == "common"
    assert len(got) == 6
