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
