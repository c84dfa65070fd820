"""X-series — text-analysis extensions for training-data pipelines.

Language ID, quality scoring, tokenizer-style counting, document
fingerprinting — the text-triage operators a 100 TB pretraining-data
pipeline runs over every document. All pure Catalyst expressions
(array/higher-order/regex) mirrored exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_lab4_spark.catalog import load_table
from bigdata_lab4_spark.registry import query
from bigdata_lab4_spark.functions.text import tokens_col

# Tiny function-word lists for the n-gram/keyword language heuristic.
# (The synthetic corpus is English word-salad; the operator is the
# point, the lists are deliberately small and literal so the oracle
# can reproduce them.)
_EN_WORDS = ("the", "a", "of", "and", "to", "in", "is", "that")
_ES_WORDS = ("el", "la", "de", "y", "que", "en", "un", "es")


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "x01_language_id",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(list_intersect(
                       list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''),
                       {_sql_list(_EN_WORDS)})) AS en_score,
                   len(list_intersect(
                       list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''),
                       {_sql_list(_ES_WORDS)})) AS es_score
            FROM documents
        )
        SELECT doc_id, lang, en_score, es_score,
               CASE WHEN en_score > es_score THEN 'en'
                    WHEN es_score > en_score THEN 'es'
                    ELSE 'und' END AS guessed
        FROM scored
    """,
    doc="X1 language ID — function-word-overlap heuristic (distinct-token "
    "intersection against small literal vocabularies, argmax per doc). "
    "At scale this is a map-only pass: no shuffle, no UDF.",
)
def x01_language_id(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    en = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in _EN_WORDS])))
    es = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in _ES_WORDS])))
    scored = d.select(
        "doc_id", "lang", en.alias("en_score"), es.alias("es_score")
    )
    guessed = (
        F.when(F.col("en_score") > F.col("es_score"), "en")
        .when(F.col("es_score") > F.col("en_score"), "es")
        .otherwise("und")
    )
    return scored.select("doc_id", "lang", "en_score", "es_score", guessed.alias("guessed"))


@query(
    "x02_quality_score",
    oracle="""
        WITH stats AS (
            SELECT doc_id,
                   length(text) AS n_char,
                   len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''))
                       AS n_tok,
                   length(text) - length(translate(text,
                       '!"#$%&''()*+,-./:;<=>?@[\\]^_`{|}~', '')) AS n_punct
            FROM documents
        )
        SELECT doc_id, n_char, n_tok,
               round(n_punct * 1.0 / n_char, 6) AS punct_ratio,
               round(n_char * 1.0 / n_tok, 4)   AS chars_per_token,
               round(least(1.0, n_tok / 50.0) * (1.0 - n_punct * 1.0 / n_char), 6)
                   AS quality
        FROM stats WHERE n_char > 0 AND n_tok > 0
    """,
    doc="X2 document quality score — length/punctuation/token-shape ratios "
    "combined into a bounded score, the filter-stage heuristic of a "
    "pretraining data pipeline.",
)
def x02_quality_score(spark, sf_dir):
    import string

    d = load_table(spark, sf_dir, "documents")
    n_char = F.length("text")
    n_tok = F.size(tokens_col("text"))
    n_punct = n_char - F.length(F.translate(F.col("text"), string.punctuation, ""))
    stats = d.select(
        "doc_id", n_char.alias("n_char"), n_tok.alias("n_tok"), n_punct.alias("n_punct")
    ).filter((F.col("n_char") > 0) & (F.col("n_tok") > 0))
    punct_ratio = F.col("n_punct") / F.col("n_char")
    return stats.select(
        "doc_id",
        "n_char",
        "n_tok",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(F.col("n_char") / F.col("n_tok"), 4).alias("chars_per_token"),
        F.round(F.least(F.lit(1.0), F.col("n_tok") / 50.0) * (1.0 - punct_ratio), 6).alias(
            "quality"
        ),
    )


@query(
    "x03_token_count",
    oracle="""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''))
                   AS ws_tokens,
               len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS bpe_ish_tokens,
               len(regexp_extract_all(text, '[0-9]+'))         AS num_tokens
        FROM documents
    """,
    doc="X3 token counting — whitespace tokens vs a BPE-ish pretokenizer "
    "regex (\\w+ runs or single non-space symbols), the cost-estimation "
    "operator of an LLM data pipeline.",
)
def x03_token_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens_col("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).alias("bpe_ish_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("num_tokens"),
    )


@query(
    "x04_fingerprint",
    oracle="""
        WITH fp AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''))),
                       ' ')) AS fingerprint
            FROM documents
        )
        SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS first_doc
        FROM fp GROUP BY fingerprint
    """,
    doc="X4 document fingerprint — order-insensitive content signature "
    "(md5 of the sorted distinct token set); grouping by it clusters "
    "bag-of-words duplicates that exact-hash dedup (l01) misses.",
)
def x04_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col("text")))))
    return d.select("doc_id", fp.alias("fingerprint")).groupBy("fingerprint").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


@query(
    "x04b_rolling_fingerprint",
    oracle="""
        WITH fp AS (
            SELECT doc_id,
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(
                               list_filter(regexp_split_to_array(text, '\\s+'),
                                           t -> t != ''),
                               t -> CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT))),
                       (h, x) -> (h * 257 + x) % 2147483647) AS fingerprint
            FROM documents
        )
        SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS first_doc
        FROM fp GROUP BY fingerprint
    """,
    doc="X4b order-SENSITIVE document fingerprint — Karp–Rabin rolling "
    "hash folded over the token stream (base 257, mod 2^31-1, per-token "
    "md5-prefix hashes), complementing x04's bag-of-words signature: "
    "token reorderings collide in x04 but not here. Pure Catalyst "
    "`aggregate` fold — int64 intermediates stay exact (h < 2^31, "
    "h*257 + tok < 2^41), so the fingerprint is bit-identical across "
    "engines with no rounding guard. Map-only pass; the groupBy "
    "shuffles 8-byte fingerprints, not bodies — same 100 TB posture "
    "as l01.",
)
def x04b_rolling_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fp = F.aggregate(
        tokens_col("text"),
        F.lit(0).cast("bigint"),
        lambda h, t: (
            h * 257 + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
        ) % 2147483647,
    )
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )
