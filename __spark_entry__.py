"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship two-pass KG pipeline on sf0.001.
queries()     — per-operator DataFrame callables (SURVEY.md §2).
oracle_sql()  — matching DuckDB SQL (tripsu_spark/plans/oracle.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tripsu_spark.crypto import Pseudonymizer  # noqa: E402
from tripsu_spark.operators import curation, dedup, multimodal, similarity, text  # noqa: E402
from tripsu_spark.operators.extract import (  # noqa: E402
    GATE_CONV_PREDICATE,
    conversation_stats,
    dedupe_triples,
    extract_triples,
    filter_conversations,
)
from tripsu_spark.operators.index import build_type_index, type_index_pairs  # noqa: E402
from tripsu_spark.operators.masking import apply_masks  # noqa: E402
from tripsu_spark.plans import oracle  # noqa: E402
from tripsu_spark.plans.oracle import BENCH_SECRET  # noqa: E402
from tripsu_spark.plans.pipeline import default_rules, pseudonymize  # noqa: E402
from tripsu_spark.sources.ntriples import ntriples_lines  # noqa: E402
from tripsu_spark.sources.transcripts import transcripts_from_events  # noqa: E402

TRIPLE_COLS = ["s_kind", "s_value", "predicate", "o_kind", "o_value", "o_datatype", "o_lang"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(_events(spark, sf_dir))


def _hasher() -> Pseudonymizer:
    return Pseudonymizer.create("sha256", BENCH_SECRET)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 events -> transcripts -> extract -> index ->
    rule-driven pseudonymization. Returns the emitted triple frame."""
    transcripts = _transcripts(spark, "/root/testdata/sf0.001")
    triples = extract_triples(transcripts)
    index_df = build_type_index(triples)
    return pseudonymize(triples, index_df, default_rules(), _hasher())


# ---------------------------------------------------------------- queries

def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _transcripts(spark, sf_dir)
    return t.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def q_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedupe_triples(extract_triples(_transcripts(spark, sf_dir)))


def q_type_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return type_index_pairs(extract_triples(_transcripts(spark, sf_dir)))


def q_type_index_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        type_index_pairs(extract_triples(_transcripts(spark, sf_dir)))
        .groupBy("subject_key")
        .agg(F.count("*").alias("n_types"))
    )


def q_masked_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    triples = extract_triples(_transcripts(spark, sf_dir))
    index_df = build_type_index(triples)
    masked = apply_masks(triples, index_df, default_rules())
    return masked.select(*TRIPLE_COLS, "mask_subject", "mask_object").distinct()


def q_masked_triples_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same rules with invert: true (rules.rs:158-163)."""
    import dataclasses

    triples = extract_triples(_transcripts(spark, sf_dir))
    index_df = build_type_index(triples)
    rules = dataclasses.replace(default_rules(), invert=True)
    masked = apply_masks(triples, index_df, rules)
    return masked.select(*TRIPLE_COLS, "mask_subject", "mask_object").distinct()


def q_pseudo_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    triples = extract_triples(_transcripts(spark, sf_dir))
    index_df = build_type_index(triples)
    return pseudonymize(triples, index_df, default_rules(), _hasher()).distinct()


def q_ntriples_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ntriples_lines(q_pseudo_triples(spark, sf_dir)).distinct()


def q_ntriples_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 parser with a driver-visible oracle row: serialize the
    extracted graph to N-Triples text, parse it back (sources/
    ntriples.py — the reference's entire input surface, io.rs:24-43),
    and return the parsed triples. Serialize-then-parse is identity on
    terms (escapes round-trip), so the oracle is plain extraction."""
    from tripsu_spark.sources.ntriples import parse_ntriples_lines

    triples = dedupe_triples(extract_triples(_transcripts(spark, sf_dir)))
    lines = ntriples_lines(triples).withColumnRenamed("line", "value")
    parsed = parse_ntriples_lines(lines)
    return parsed.filter(F.col("_error").isNull()).drop("_error")


def q_depseudo_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymize then invert via the (hash -> original) mapping;
    the oracle is the plain extraction — round-trip must be identity
    (BASELINE metric: round-trip de-pseudonymization)."""
    from tripsu_spark.operators.depseudo import build_mapping, depseudonymize

    triples = extract_triples(_transcripts(spark, sf_dir))
    index_df = build_type_index(triples)
    hasher = _hasher()
    pseudo = pseudonymize(triples, index_df, default_rules(), hasher)
    return depseudonymize(pseudo, build_mapping(triples, hasher)).distinct()


def q_entity_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _transcripts(spark, sf_dir)
    return (
        t.select(
            "conv_id",
            F.explode(F.regexp_extract_all("text", F.lit(r"@user(\d+)"), 1)).alias("entity_id"),
        )
        .groupBy("conv_id", "entity_id")
        .agg(F.count("*").alias("mention_count"))
    )


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- KG construction core (tripsu parity, SURVEY.md §2 O1-O9) ---
        "transcripts": q_transcripts,
        "extract_triples": q_extract_triples,
        "type_index_pairs": q_type_index_pairs,
        "type_index_sizes": q_type_index_sizes,
        "masked_triples": q_masked_triples,
        "masked_triples_inverted": q_masked_triples_inverted,
        "pseudo_triples": q_pseudo_triples,
        "ntriples_lines": q_ntriples_lines,
        "ntriples_parse": q_ntriples_parse,
        "depseudo_roundtrip": q_depseudo_roundtrip,
        "conversation_stats": lambda s, d: conversation_stats(_transcripts(s, d)),
        # stats-driven curation gate ahead of extraction (broadcast
        # semi-join on the surviving conv_id set); GATE_CONV_PREDICATE
        # is chosen to be discriminative on the synthetic sf tables
        "filter_conversations": lambda s, d: filter_conversations(
            _transcripts(s, d), GATE_CONV_PREDICATE
        ).select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        ),
        "entity_links": q_entity_links,
        # --- training-data pipeline ops: dedup ---
        "dedup_exact": lambda s, d: dedup.dedup_exact(_documents(s, d)),
        "dedup_conversations": lambda s, d: dedup.dedup_conversations_exact(_transcripts(s, d)),
        "dedup_minhash_lsh": lambda s, d: dedup.dedup_minhash_lsh(_documents(s, d)),
        "dedup_minhash_lsh_128": lambda s, d: dedup.dedup_minhash_lsh(
            _documents(s, d), dedup.NUM_HASHES_PROD, dedup.BAND_SIZE_PROD
        ),
        "dedup_ngram_jaccard": lambda s, d: dedup.dedup_ngram_jaccard(_documents(s, d)),
        "dedup_clusters": lambda s, d: dedup.dedup_clusters(_documents(s, d)),
        "dedup_simhash": lambda s, d: dedup.simhash(_documents(s, d)),
        "dedup_simhash_64": lambda s, d: dedup.simhash(_documents(s, d), dedup.SIMHASH_BITS_PROD),
        "dedup_conversations_bounded": lambda s, d: dedup.dedup_conversations_bounded(
            _transcripts(s, d)
        ),
        "dedup_embedding_cosine": lambda s, d: similarity.dedup_embedding_cosine(_embeddings(s, d)),
        "dedup_embedding_cosine_lsh": lambda s, d: similarity.dedup_embedding_cosine_lsh(_embeddings(s, d)),
        # --- similarity search ---
        "ann_cosine_topk": lambda s, d: similarity.ann_topk(_embeddings(s, d)),
        "ann_lsh_buckets": lambda s, d: similarity.lsh_buckets(_embeddings(s, d)),
        "ann_cosine_topk_lsh": lambda s, d: similarity.ann_topk_lsh(_embeddings(s, d)),
        "ann_ivf_assign": lambda s, d: similarity.ivf_assign(_embeddings(s, d)),
        "ann_cosine_topk_ivf": lambda s, d: similarity.ann_topk_ivf(_embeddings(s, d)),
        "ann_cosine_topk_ivf_kmeans": lambda s, d: similarity.ann_topk_ivf_kmeans(_embeddings(s, d)),
        # --- text analysis ---
        "token_count": lambda s, d: text.token_count(_documents(s, d)),
        "quality_score": lambda s, d: text.quality_score(_documents(s, d)),
        "lang_id": lambda s, d: text.lang_id(_documents(s, d)),
        "doc_fingerprint": lambda s, d: text.doc_fingerprint(_documents(s, d)),
        "normalize_text": lambda s, d: text.normalize_text(_documents(s, d)),
        "scrub_pii": lambda s, d: text.scrub_pii(_documents(s, d)),
        "repetition_metrics": lambda s, d: text.repetition_metrics(_documents(s, d)),
        # --- multimodal (pandas-UDF decode plumbing, fake decode) ---
        "multimodal_features": lambda s, d: multimodal.multimodal_features(_documents(s, d)),
        # --- curation / data mixing ---
        "sample_stratified": lambda s, d: curation.sample_stratified(_documents(s, d)),
        "cap_per_group": lambda s, d: curation.cap_per_group(_documents(s, d)),
        "pack_sequences": lambda s, d: curation.pack_sequences(_documents(s, d)),
        # strict bin packing runs as applyInPandas; its oracle is the
        # recursive-CTE recurrence in curation.pack_sequences_strict_oracle
        "pack_sequences_strict": lambda s, d: curation.pack_sequences_strict(
            _documents(s, d)
        ),
        "mixture_plan": lambda s, d: curation.mixture_plan(_documents(s, d)),
        # water-filling variant: unfilled quota from capped sources is
        # reallocated proportionally across the non-capped ones
        "mixture_plan_redistributed": lambda s, d: curation.mixture_plan(
            _documents(s, d), redistribute=True
        ),
        "apply_mixture": lambda s, d: curation.apply_mixture(_documents(s, d)),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": oracle.q_transcripts(),
        "extract_triples": oracle.q_extract_triples(),
        "type_index_pairs": oracle.q_type_index_pairs(),
        "type_index_sizes": oracle.q_type_index_sizes(),
        "masked_triples": oracle.q_masked_triples(),
        "masked_triples_inverted": oracle.q_masked_triples_inverted(),
        "pseudo_triples": oracle.q_pseudo_triples(),
        "ntriples_lines": oracle.q_ntriples_lines(),
        # serialize-then-parse == identity: the oracle is the extraction
        "ntriples_parse": oracle.q_extract_triples(),
        # round-trip inverse == identity: the oracle is the extraction
        "depseudo_roundtrip": oracle.q_extract_triples(),
        "conversation_stats": oracle.q_conversation_stats(),
        "filter_conversations": oracle.q_filter_conversations(),
        "entity_links": oracle.q_entity_links(),
        "dedup_exact": dedup.dedup_exact_oracle(),
        "dedup_conversations": dedup.dedup_conversations_exact_oracle(
            oracle.TRANSCRIPTS_CTE
        ),
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh_oracle(),
        "dedup_minhash_lsh_128": dedup.dedup_minhash_lsh_oracle(
            dedup.NUM_HASHES_PROD, dedup.BAND_SIZE_PROD
        ),
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard_oracle(),
        "dedup_clusters": dedup.dedup_clusters_oracle(),
        "dedup_simhash": dedup.simhash_oracle(),
        "dedup_simhash_64": dedup.simhash_oracle(dedup.SIMHASH_BITS_PROD),
        "dedup_conversations_bounded": dedup.dedup_conversations_bounded_oracle(
            oracle.TRANSCRIPTS_CTE
        ),
        "dedup_embedding_cosine": similarity.dedup_embedding_cosine_oracle(),
        "dedup_embedding_cosine_lsh": similarity.dedup_embedding_cosine_lsh_oracle(),
        "ann_cosine_topk": similarity.ann_topk_oracle(),
        "ann_lsh_buckets": similarity.lsh_buckets_oracle(),
        "ann_cosine_topk_lsh": similarity.ann_topk_lsh_oracle(),
        "ann_ivf_assign": similarity.ivf_assign_oracle(),
        "ann_cosine_topk_ivf": similarity.ann_topk_ivf_oracle(),
        "ann_cosine_topk_ivf_kmeans": similarity.ann_topk_ivf_kmeans_oracle(),
        "token_count": text.token_count_oracle(),
        "quality_score": text.quality_score_oracle(),
        "lang_id": text.lang_id_oracle(),
        "doc_fingerprint": text.doc_fingerprint_oracle(),
        "normalize_text": text.normalize_text_oracle(),
        "scrub_pii": text.scrub_pii_oracle(),
        "repetition_metrics": text.repetition_metrics_oracle(),
        "multimodal_features": multimodal.multimodal_features_oracle(),
        "sample_stratified": curation.sample_stratified_oracle(),
        "cap_per_group": curation.cap_per_group_oracle(),
        "pack_sequences": curation.pack_sequences_oracle(),
        "pack_sequences_strict": curation.pack_sequences_strict_oracle(),
        "mixture_plan": curation.mixture_plan_oracle(),
        "mixture_plan_redistributed": curation.mixture_plan_redistributed_oracle(),
        "apply_mixture": curation.apply_mixture_oracle(),
    }
