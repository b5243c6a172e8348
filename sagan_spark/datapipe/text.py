"""Text-analysis operators for training-data pipelines: language-ID
(stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex pieces), and document fingerprinting
(polynomial rolling hash + winnowing minimum).

All builtin expressions — single projection per operator, no shuffle,
no UDF.  DuckDB twins use the same formulas (verified identical
char-split / ascii / modular-arithmetic semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sagan_spark.datapipe.dedup import h32_spark, h32_sql

STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "y"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic argmax tiebreak

BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"
FP_MOD = 1_000_000_007
WINNOW_K = 8


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, + per-lang stopword hit counts)."""
    toks = F.split(F.col("text"), " ")
    df = docs
    for lang in LANG_ORDER:
        hits = F.size(
            F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        ).cast("long")
        df = df.withColumn(f"{lang}_hits", hits)
    pred = F.lit(LANG_ORDER[-1])
    best = F.col(f"{LANG_ORDER[-1]}_hits")
    for lang in reversed(LANG_ORDER[:-1]):  # earlier lang wins ties
        pred = F.when(F.col(f"{lang}_hits") >= best, F.lit(lang)).otherwise(pred)
        best = F.greatest(F.col(f"{lang}_hits"), best)
    return df.withColumn("lang_pred", pred).select(
        "doc_id", "lang_pred", *[f"{l}_hits" for l in LANG_ORDER]
    )


def lang_id_sql() -> str:
    hit_exprs = []
    for lang in LANG_ORDER:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        hit_exprs.append(
            f"len(list_intersect(list_distinct(string_split(text, ' ')), [{lst}]))::BIGINT AS {lang}_hits"
        )
    # fold argmax with earlier-language-wins-ties, mirroring the Spark chain
    pred = f"'{LANG_ORDER[-1]}'"
    best = f"{LANG_ORDER[-1]}_hits"
    for lang in reversed(LANG_ORDER[:-1]):
        pred = f"CASE WHEN {lang}_hits >= {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest({lang}_hits, {best})"
    cols = ", ".join(f"{l}_hits" for l in LANG_ORDER)
    return (
        f"SELECT doc_id, {pred} AS lang_pred, {cols} "
        f"FROM (SELECT doc_id, {', '.join(hit_exprs)} FROM documents)"
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_pieces, n_chars_nospace)."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_pieces"),
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("long").alias(
            "n_chars_nospace"
        ),
    )


def token_counts_sql() -> str:
    return (
        "SELECT doc_id, "
        "len(string_split(text, ' '))::BIGINT AS n_ws_tokens, "
        f"len(regexp_extract_all(text, '{BPE_RE}'))::BIGINT AS n_bpe_pieces, "
        "length(replace(text, ' ', ''))::BIGINT AS n_chars_nospace "
        "FROM documents"
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, stop_ratio, mean_token_len, length_score, quality) —
    simple web-text quality heuristics (stopword density, token shape,
    length saturation), rounded for cross-engine float stability."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("double")
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en)).cast("double")
    nchars = F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
    stop_ratio = F.round(stop_hits / F.lit(len(STOPWORDS["en"])), 6)
    mean_len = F.round(nchars / n, 6)
    length_score = F.round(F.least(n / 100.0, F.lit(1.0)), 6)
    quality = F.round(
        0.4 * stop_ratio + 0.4 * length_score + 0.2 * F.least(mean_len / 6.0, F.lit(1.0)),
        6,
    )
    return docs.select(
        "doc_id",
        stop_ratio.alias("stop_ratio"),
        mean_len.alias("mean_token_len"),
        length_score.alias("length_score"),
        quality.alias("quality"),
    )


def quality_scores_sql() -> str:
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
    stop_hits = (
        f"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), [{en}])) AS DOUBLE)"
    )
    nchars = "CAST(length(replace(text, ' ', '')) AS DOUBLE)"
    stop_ratio = f"round({stop_hits} / {len(STOPWORDS['en'])}, 6)"
    mean_len = f"round({nchars} / {n}, 6)"
    length_score = f"round(least({n} / 100.0, 1.0), 6)"
    quality = (
        f"round(0.4 * {stop_ratio} + 0.4 * {length_score} + "
        f"0.2 * least({mean_len} / 6.0, 1.0), 6)"
    )
    return (
        f"SELECT doc_id, {stop_ratio} AS stop_ratio, {mean_len} AS mean_token_len, "
        f"{length_score} AS length_score, {quality} AS quality FROM documents"
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, poly_fp, winnow_fp): full-text polynomial hash mod 1e9+7
    and the minimum 32-bit hash over rolling 8-char grams (winnowing)."""
    chars = F.split(F.col("text"), "")
    poly = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FP_MOD,
    )
    n = F.length("text")
    grams = F.when(
        n >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(1), n - WINNOW_K + 1),
            lambda i: h32_spark(F.substr(F.col("text"), i, F.lit(WINNOW_K))),
        ),
    ).otherwise(F.array(h32_spark(F.col("text"))))
    return docs.select(
        "doc_id",
        poly.alias("poly_fp"),
        F.array_min(grams).alias("winnow_fp"),
    )


def fingerprints_sql() -> str:
    poly = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)), "
        f"(a, c) -> (a * 31 + c) % {FP_MOD})"
    )
    gram = h32_sql(f"substring(text, i, {WINNOW_K})")
    grams = (
        f"CASE WHEN length(text) >= {WINNOW_K} THEN "
        f"list_transform(range(1, length(text) - {WINNOW_K} + 2), i -> {gram}) "
        f"ELSE [{h32_sql('text')}] END"
    )
    return (
        f"SELECT doc_id, {poly} AS poly_fp, list_min({grams}) AS winnow_fp "
        "FROM documents"
    )
