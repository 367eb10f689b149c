"""Cross-engine edge parity: the registered document queries and their
DuckDB oracles, run over a PATHOLOGICAL documents table (null text,
empty text, whitespace-only, unicode, single-token, very long, null
lang/source) instead of the well-behaved driver fixtures.

The driver regenerates testdata every round; this pins that the
Spark/DuckDB twins stay hash-identical on the document shapes a fresh
generator might emit, instead of discovering it as a red
CORRECTNESS row."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from metrocloud_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES

DOC_QUERIES = [
    "tfidf_top_terms",
    "vocab_coverage",
    "source_mix_temperature",
    "quality_quantile_filter",
    "dedup_cross_corpus",
    "unigram_surprisal",
    "cap_per_source",
    "shard_manifest",
    "quality_deciles",
    "source_scorecard",
    "dedup_jaccard_prefix",
    "winnow_overlap_pairs",
    "media_dedup_exact",
    "text_token_stats",
    "text_quality_score",
    # late-r5 document queries
    "dedup_incremental_jaccard",
    "split_leakage_report",
    "text_length_histogram",
    # r9 document queries: substring spans/excise stress the null/
    # empty/whitespace/unicode/long-repetitive rows hardest (gram
    # assembly + interval union + position rebuild), rag chunk dedup
    # the chunk-grid edges
    "dedup_substring_spans",
    "dedup_substring_excise",
    "dedup_rag_chunks",
    "dedup_keep_best",
    "text_repetition_panel",
    "gopher_quality_panel",
    "c4_line_filter",
    "dedup_c4_sentence_spans",
    "boilerplate_line_filter",
    "ccnet_perplexity_buckets",
    "corpus_filter_funnel",
    # round-9 batch 2: fertility/diversity/entropy panels, the
    # cross-source overlap matrix and rank fusion — entropy and the
    # gram ops stress the unicode/whitespace-only/long-repetitive
    # rows, rank fusion the tie-dense short rows
    "text_fertility_by_lang",
    "text_ngram_diversity",
    "text_char_entropy",
    "dedup_source_overlap",
    "quality_rank_fusion",
    # round-9 batch 3 (embed_label_purity reads embeddings — outside
    # this documents-only fixture): zipf's NULL-guard paths and the
    # JSD identity/disjoint branches both fire on the pathological rows
    "text_zipf_slope",
    "source_js_divergence",
    # round-9 batch 4: KN smoothing over the whitespace-only/self-
    # repeat rows; the epoch plan's zero-weight/null-source branches;
    # the band planner is table-free (a constant-table parity pin)
    "kn_bigram_surprisal",
    # round-10: KN one order up — the whitespace-only/self-repeat rows
    # exercise the continuation-count CTEs' empty/degenerate branches
    "kn_trigram_surprisal",
    "ccnet_perplexity_buckets_kn3",
    "mixture_epoch_plan",
    "lsh_band_planner",
    "doc_outlier_panel",
    "corpus_datacard",
    "context_length_plan",
    "sample_mix_audit",
    "winnow_similar_topk",
    "text_hot_tokens",
    "quality_signal_correlation",
    "langid_confusion",
    "shard_skew_report",
    "dedup_impact_by_source",
    "source_filter_funnel",
    # r12 completeness sweep: every remaining oracle-backed documents-only
    # key a registry scan found absent from this list
    "bigram_surprisal",
    "ccnet_perplexity_buckets_exact_dist",
    "corpus_budget_select",
    "decontaminate_ngram",
    "dedup_cluster_histogram",
    "dedup_clusters",
    "dedup_exact",
    "dedup_keep_list",
    "dedup_ngram_jaccard",
    "doc_fingerprint_winnow",
    "dsir_importance_weights",
    "lang_source_stats",
    "langid_heuristic",
    "media_audio_features",
    "media_feature_extract",
    "media_frame_sample",
    "media_type_summary",
    "media_video_features",
    "pii_scrub_stats",
    "quality_filter_report",
    "rag_chunk_documents",
    "sample_weighted_sources",
    "seq_pack_ranges",
    "stratified_split",
    "text_bpe_token_stats",
    "text_clean_stats",
    "text_repetition_stats",
    # r13: frame-fingerprint video near-dup (synth from doc_id only,
    # so null/unicode text rows ride through untouched)
    "media_video_near_dup",
    # r14: its recall audit over planted re-containered copies (same
    # doc_id-only synth path, doubled corpus), and the decode-free
    # container probe over the mixed WAV/AVI/MP3 synth corpus
    "media_neardup_recall_report",
    "media_container_probe",
    # r15: the audio near-dup tier (band-argmax fingerprints over the
    # tone-sequence synth — doc_id-only derivation like the video
    # tier, so pathological text rows ride through untouched) and its
    # recall audit over planted 24-bit re-encoded copies
    "media_audio_near_dup",
    "media_audio_neardup_recall",
    # r15 cont.: the image near-dup tier (dHash over the gradient
    # synth — doc_id-only derivation, so pathological text rows ride
    # through untouched) and its recall audit over planted
    # brightness-shifted copies
    "media_image_near_dup",
    "media_image_neardup_recall",
]

EDGE_ROWS = [
    (0, None, "en", "s0", 0),                      # null text
    (1, "", "en", "s0", 0),                        # empty text
    (2, "   \t  ", "en", "s1", 6),                 # whitespace only
    (3, "one", "en", "s1", 3),                     # single token
    (4, "ünïcode tökens naïve café 北京 东京", None, "s2", 33),  # unicode + null lang
    (5, "a b c d e f g h i j k l m n o p", "en", None, 31),     # null source
    (6, "repeat " * 200, "en", "s3", 1400),        # long, highly repetitive
    (7, " ".join(f"w{i}" for i in range(500)), "en", "s3", 2489),  # long diverse
    (8, "MIXED Case WITH   irregular    spacing", "en", "s4", 38),
    (9, "MIXED case with irregular spacing", "en", "s4", 33),   # near-dup of 8
    (10, "shared shard text", "en", "s5", 17),
    (20, "shared shard text", "en", "s5", 17),     # exact dup, 20 % 10 == 0
    # r12 second wave: regex metacharacters as TOKENS (an engine that
    # ever interpolated data into a pattern would corrupt here) and
    # exotic unicode (ZWJ emoji families, flags, NBSP inside a token —
    # \\s does not match NBSP in either engine, so it must stay ONE
    # token in both)
    (21, "a+b (c|d) [e] {f} \\ $ ^ . * ? a+b", "en", "s6", 31),
    (22, "👩‍👩‍👧‍👧 🇫🇮 café nbsp 𝔘𝔫𝔦𝔠𝔬𝔡𝔢", None, "s6", 30),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    spark.createDataFrame(
        EDGE_ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _canon(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    d = d.sort_values(by=cols).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_parity(spark, edge_dir, name):
    got = SPARK_QUERIES[name](spark, edge_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(ORACLE_SQL[name]).df()
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    assert _canon(got) == _canon(want), (
        got.sort_values(by=sorted(got.columns)).head(20),
        want.sort_values(by=sorted(want.columns)).head(20),
    )
