"""Text-analysis pack — SURVEY.md §2.10 X4 and the training-data
pipeline operators (language-ID heuristic, quality scoring, token
counting, document fingerprinting).

Everything here is built-in array/string functions with SQL lambdas
(``filter``/``transform``/``aggregate``) — JVM-side, codegen-friendly,
no Python in the hot path. The same expressions run unchanged over a
100 TB corpus; the only scale lever is partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

# tiny English function-word list used by the quality / lang-id heuristics
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def with_tokens(docs: DataFrame) -> DataFrame:
    """documents + a ``toks`` array column (whitespace tokenization —
    the reference corpus is space-joined; a BPE-ish regex tokenizer is
    in ``text_token_bpe_regex``)."""
    return docs.withColumn("toks", F.split(F.col("text"), " "))


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS ttr,
           CAST(length(text) AS BIGINT) AS n_chars_computed
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type-token ratio per document. Int/int division
    in double is deterministic across engines (unlike float SUMs)."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n_tok = F.size("toks")
    n_dis = F.size(F.array_distinct("toks"))
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        n_dis.cast("int").alias("n_distinct"),
        (n_dis.cast("double") / n_tok).alias("ttr"),
        F.length("text").cast("long").alias("n_chars_computed"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) * 1.0
               / len(string_split(text, ' ')) AS stop_ratio,
           list_aggregate(list_transform(string_split(text, ' '),
                                         t -> length(t)), 'sum') * 1.0
               / len(string_split(text, ' ')) AS avg_token_len,
           CASE WHEN len(string_split(text, ' ')) >= 40
                 AND len(list_filter(string_split(text, ' '),
                                     t -> t IN ({_STOP_SQL}))) * 1.0
                     / len(string_split(text, ' ')) >= 0.05
                THEN 'good' ELSE 'low' END AS quality_band
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + mean token length + a banding
    rule — the filter stage of a training-data pipeline. SQL lambdas
    (``filter``/``transform``/``aggregate``) keep it JVM-side."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n_tok = F.size("toks")
    n_stop = F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tok
    sum_len = F.aggregate(
        "toks", F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        "doc_id",
        stop_ratio.alias("stop_ratio"),
        (sum_len.cast("double") / n_tok).alias("avg_token_len"),
        F.when((n_tok >= 40) & (stop_ratio >= 0.05), "good")
        .otherwise("low")
        .alias("quality_band"),
    )


@query(
    "text_langid_heuristic",
    oracle=f"""
    SELECT doc_id, lang,
           len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) * 1.0
               / len(string_split(text, ' ')) AS en_score,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     t -> t IN ({_STOP_SQL}))) * 1.0
                     / len(string_split(text, ' ')) >= 0.08
                THEN 'en' ELSE 'other' END AS lang_guess
    FROM documents
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: function-word frequency scoring (the
    n-gram-profile approach reduced to a 1-gram marker list). Output
    keeps the corpus ``lang`` label alongside for accuracy analysis."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n_tok = F.size("toks")
    en_score = (
        F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS))).cast("double")
        / n_tok
    )
    return docs.select(
        "doc_id",
        "lang",
        en_score.alias("en_score"),
        F.when(en_score >= 0.08, "en").otherwise("other").alias("lang_guess"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                               ' ')) AS fingerprint,
           md5(text) AS exact_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of the text (exact-dup key) and of
    the sorted distinct token set (a bag-of-words canonical form robust
    to token order — the cheap fingerprint for X1 exact dedup at scale)."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct("toks")))
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.md5("text").alias("exact_hash"),
    )


@query(
    "text_top20_bigrams",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams GROUP BY bigram
    ORDER BY n DESC, bigram ASC LIMIT 20
    """,
)
def text_top20_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 token bigrams: transform to n-grams,
    explode, count. The n-gram construction is an array lambda (no
    shuffle); the single shuffle is the count group-by."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (x, i) -> concat(x, ' ', toks[i + 1]))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "text_token_bpe_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def text_token_bpe_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: regex pre-tokenizer (letter runs /
    digit runs / single punctuation) compared with whitespace counts —
    the cheap token-budget estimator for a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast("long").alias(
            "n_bpe_tokens"
        ),
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf AS DOUBLE) * n.n_docs / df.df DESC,
                            tf.term) AS rnk
        FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, score, CAST(rnk AS INT) AS rnk
    FROM scored WHERE rnk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style salient terms: top-3 terms per document scored by
    tf · N/df. The inverse document frequency is kept as the raw ratio
    (no logarithm) so the score is a ratio of exact integers — libm's
    ln differs between engines in the last ulp and would break the
    value-hash compare; the *ranking* is identical either way since
    ln is monotonic.

    Plan: one shuffle for tf (doc, term), one for df (term), broadcast
    the one-row corpus count, rank per doc. At 100 TB the df table is
    the only wide state and it's bounded by vocabulary size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double") * F.col("n_docs") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "score", "rnk")
    )
