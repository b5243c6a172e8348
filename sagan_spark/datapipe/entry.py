"""queries()/oracle_sql() catalog for the data-pipeline operators
(dedup / similarity / text analysis / multimodal) — consumed by
``__spark_entry__.py``."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sagan_spark.datapipe import dedup, similarity, text
from sagan_spark.datapipe.corpus import corpus_with, load_corpus

QUERY_REP = 4  # must match __spark_entry__.QUERY_REP


def _q_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(load_corpus(spark, sf_dir))


def _q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(load_corpus(spark, sf_dir))


def _q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(load_corpus(spark, sf_dir))
    )


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_corpus(spark, sf_dir)
    pairs = dedup.lsh_candidate_pairs(dedup.minhash_signatures(corpus))
    return dedup.jaccard_verify(corpus, pairs)


def _q_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_corpus(spark, sf_dir)
    pairs = dedup.jaccard_verify(
        corpus, dedup.lsh_candidate_pairs(dedup.minhash_signatures(corpus))
    )
    return dedup.dedup_clusters(corpus, pairs)


def _q_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_multiprobe_topk(similarity.load_embeddings(spark, sf_dir))


def _q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_neardup_pairs(similarity.load_embeddings(spark, sf_dir))


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.with_simhash(load_corpus(spark, sf_dir)).select("doc_id", "simhash")


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = dedup.with_simhash(load_corpus(spark, sf_dir)).select("doc_id", "simhash")
    return dedup.simhash_pairs(sim)


def _q_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(similarity.load_embeddings(spark, sf_dir))


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_topk(similarity.load_embeddings(spark, sf_dir))


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(similarity.load_embeddings(spark, sf_dir))


def _q_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(text.load_documents(spark, sf_dir))


def _q_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_counts(text.load_documents(spark, sf_dir))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(text.load_documents(spark, sf_dir))


def _q_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(text.load_documents(spark, sf_dir))


def _q_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.datapipe.multimodal import media_features
    from sagan_spark.pages import pages_table

    return media_features(pages_table(spark, sf_dir, rep=QUERY_REP))


def _q_media_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.datapipe.mediahdr import header_roundtrip
    from sagan_spark.datapipe.text import load_documents

    return header_roundtrip(load_documents(spark, sf_dir))


def datapipe_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": _q_exact,
        "dedup_minhash_signatures": _q_minhash_sigs,
        "dedup_minhash_lsh_pairs": _q_lsh_pairs,
        "dedup_ngram_jaccard": _q_jaccard,
        "dedup_clusters": _q_clusters,
        "dedup_embedding_cosine": _q_emb_neardup,
        "ann_lsh_multiprobe": _q_ann_multiprobe,
        "dedup_simhash_values": _q_simhash,
        "dedup_simhash_pairs": _q_simhash_pairs,
        "ann_bruteforce_cosine": _q_ann_brute,
        "ann_lsh_bucketed": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "text_lang_id": _q_lang,
        "text_token_counts": _q_tokens,
        "text_quality_scores": _q_quality,
        "text_fingerprints": _q_fp,
        "multimodal_media_meta": _q_media,
        "multimodal_header_roundtrip": _q_media_hdr,
    }


def datapipe_oracles() -> dict[str, str]:
    from sagan_spark.datapipe.mediahdr import header_roundtrip_sql
    from sagan_spark.datapipe.multimodal import media_features_sql
    from sagan_spark.pages import pages_with

    cw = corpus_with()
    return {
        "dedup_exact": cw + "\n" + dedup.EXACT_DEDUP_SQL,
        "dedup_minhash_signatures": cw + "\n" + dedup.minhash_sig_sql(),
        "dedup_minhash_lsh_pairs": cw + dedup.lsh_ctes() + "\n" + dedup.LSH_PAIRS_SELECT,
        "dedup_ngram_jaccard": cw + dedup.lsh_ctes() + dedup.jaccard_pairs_sql(),
        "dedup_clusters": cw.replace("WITH ", "WITH RECURSIVE ", 1)
        + dedup.lsh_ctes()
        + dedup.jaccard_ctes()
        + dedup.clusters_sql(),
        "ann_lsh_multiprobe": similarity.lsh_multiprobe_sql(),
        "dedup_embedding_cosine": similarity.embedding_neardup_sql(),
        "dedup_simhash_values": cw + "\n" + dedup.simhash_sql(),
        "dedup_simhash_pairs": cw + dedup.simhash_pairs_sql(),
        "ann_bruteforce_cosine": similarity.brute_force_sql(),
        "ann_lsh_bucketed": similarity.lsh_topk_sql(),
        "ann_ivf_topk": similarity.ivf_topk_sql(),
        "text_lang_id": text.lang_id_sql(),
        "text_token_counts": text.token_counts_sql(),
        "text_quality_scores": text.quality_scores_sql(),
        "text_fingerprints": text.fingerprints_sql(),
        "multimodal_media_meta": pages_with(rep=QUERY_REP) + "\n" + media_features_sql(),
        "multimodal_header_roundtrip": header_roundtrip_sql(),
    }
