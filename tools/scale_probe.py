"""10x scale probe: run the heavy operators on an in-memory 10x union
of the sf0.1 tables (id-offset copies, texts perturbed per copy so
copies are near- but not exact dups) and print wall-clock + row counts.

Evidence for the would-this-survive-10x question without writing any
test data: sub-linear wall-clock growth (parallelism absorbs the extra
data) and no candidate-pair explosion beyond the semantically-quadratic
dup clusters the perturbed copies deliberately create.

    python tools/scale_probe.py [copies]
"""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from metrocloud_data_pipeline_spark.llm import curation, dedup, similarity  # noqa: E402
from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import load  # noqa: E402

SF = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load(spark, SF, "documents")
    docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs1.select(
                (F.col("doc_id") + i * OFFSET).alias("doc_id"),
                F.concat(F.lit(f"v{i} "), F.col("text")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 3).alias("n_chars"),
            )
            for i in range(copies)
        ],
    )
    emb1 = load(spark, SF, "embeddings")
    emb = reduce(
        lambda a, b: a.unionByName(b),
        [
            emb1.select((F.col("vec_id") + i * OFFSET).alias("vec_id"), "label", "embedding")
            for i in range(copies)
        ],
    )

    def t(df, label: str) -> None:
        # accepts a thunk so operators that run jobs eagerly during
        # construction (duplicate_clusters' checkpointed rounds) are
        # timed too, not just the final count
        t0 = time.time()
        if callable(df):
            df = df()
        n = df.count()
        print(f"{label:<16} {time.time() - t0:6.2f} s  {n:>10,} rows")

    print(f"--- {copies}x sf0.1: {docs.count():,} docs, {emb.count():,} vectors")
    t(dedup.exact_dedup(docs), "exact_dedup")
    t(dedup.minhash_dedup(docs), "minhash_dedup")
    t(dedup.simhash_dedup(docs), "simhash_dedup")
    t(similarity.ivf_topk(emb, query_vec_id=7, k=10), "ivf_topk")
    bench_docs = docs.where(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    # the filters reference the aggregated column, so Catalyst cannot
    # eliminate the left join under count()
    t(
        curation.contamination_check(docs, bench_docs, n=6).where(
            F.col("contamination_frac") >= 0
        ),
        "contamination",
    )
    t(curation.repetition_stats(docs, n=2).where(F.col("dup_ngram_frac") >= 0), "repetition")
    # capped-bucket candidate path: the clusters stay bounded because the
    # perturbed copies form cliques whose pair lists the cap truncates
    t(
        lambda: dedup.duplicate_clusters(
            dedup.token_jaccard_pairs_lsh(docs, threshold=0.95, max_bucket_size=500).select(
                "doc_a", "doc_b"
            )
        ),
        "dup_clusters",
    )

    # r5 curation additions: the token-frame pipeline (tfidf/surprisal)
    # and the iterative k-means — both should grow near-linearly, and
    # k-means driver traffic stays O(partitions * k) regardless of rows
    from metrocloud_data_pipeline_spark.llm import text as llm_text

    t(lambda: llm_text.tfidf_top_terms(docs, k=5), "tfidf_topk")
    t(lambda: llm_text.unigram_surprisal(docs), "surprisal")
    # r10: order-3 interpolated KN — type-frame joins must grow with
    # DISTINCT grams (sub-linear in occurrences), measured 3.4x wall
    # at 10x grams in PROBE_r10 §d
    t(lambda: llm_text.kn_trigram_surprisal(docs), "kn3_surprisal")
    # r11: order-5 hashed KN — the context frames are n_buckets-BOUNDED
    # (2^22 fixed-width keys), so 10x occurrences must grow the type
    # frame sub-linearly and the context frames not at all once full
    t(lambda: llm_text.kn5_surprisal_hashed(docs), "kn5_hashed")
    t(lambda: similarity.kmeans_cluster_stats(emb, k=16, n_iter=4), "kmeans_16x4")
    # r12: the real-audio DSP chain (synth -> WAV encode -> decode ->
    # FFT -> mel) — map-only over a doc_id-pruned scan, so wall must
    # grow ~linearly in rows with zero shuffle
    from metrocloud_data_pipeline_spark.llm import multimodal as llm_mm

    t(
        lambda: llm_mm.extract_features(
            llm_mm.synth_tone_corpus(docs.where(F.col("doc_id") % 3 == 1)),
            decode_stub=False,
        ),
        "audio_dsp_chain",
    )
    # r12: the scale-exact distributed ntile — rank-exact CCNet thirds
    # with no per-language single-task sort; at copies x the dominant
    # language spans partitions instead of serializing into one task
    t(lambda: curation.ccnet_perplexity_buckets_distributed(docs), "ccnet_ntile_dist")

    # late-r5 additions: the incremental ingest gate (batch vs standing
    # corpus at `copies`x), cluster-bounded semantic dedup, and the
    # event-analytics shapes (funnel/retention reduce events to
    # keys-sized frames, so they should be nearly flat vs data volume)
    incoming = docs.where(F.col("doc_id") % 97 == 0)
    standing = docs.where(F.col("doc_id") % 97 != 0)
    t(
        lambda: dedup.cross_corpus_jaccard(incoming, standing, threshold=0.95),
        "incr_jaccard",
    )
    t(lambda: similarity.semdedup_pairs(emb, k=32, n_iter=2, threshold=0.99), "semdedup")
    # r11: the prefix-filter join's PRODUCTION config at `copies`x —
    # baskets cloned with per-copy token namespaces so vocab grows with
    # docs (ratio preserved, guard stays satisfied, prefixes keep
    # pruning); candidate pairs must stay ~linear in docs, not quadratic
    li1 = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    o1 = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    basket1 = (
        li1.join(o1, li1.l_orderkey == o1.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    bask_docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            basket1.select(
                (F.col("o_custkey") + i * OFFSET).cast("long").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        "parts", lambda x, _i=i: F.concat(F.lit(f"c{_i}p"), x.cast("string"))
                    ),
                ).alias("text"),
            )
            for i in range(copies)
        ],
    )
    near = bask_docs.select(
        (F.col("doc_id") + 100 * OFFSET).alias("doc_id"),
        F.substring_index("text", " ", -1).alias("_drop"),
        "text",
    ).select(
        "doc_id",
        F.expr("rtrim(substring(text, 1, length(text) - length(_drop)))").alias("text"),
    )
    t(
        lambda: dedup.token_jaccard_pairs_prefix(
            bask_docs.unionByName(near).where(F.length("text") > 0), threshold=0.95
        ),
        "jaccard_prefix_natural",
    )
    ev = load(spark, SF, "events")
    from metrocloud_data_pipeline_spark.operators import temporal as T

    t(lambda: T.funnel_steps(ev, ["view", "click", "purchase"]), "funnel")
    t(lambda: T.cohort_retention(ev), "retention")
    # int8 quantization is a single narrow Arrow pass — must be ~linear
    emb10 = emb
    t(lambda: similarity.quantize_embeddings_int8(emb10), "quantize_int8")
    # SCD2 merge: dimension = `copies`x customer clone, update batch = 1/7th
    from metrocloud_data_pipeline_spark.operators.maintenance import scd2_merge

    cust1 = load(spark, SF, "customer")
    cust = reduce(
        lambda a, b: a.unionByName(b),
        [
            cust1.select(
                (F.col("c_custkey") + i * OFFSET).alias("c_custkey"), "c_acctbal", "c_mktsegment"
            )
            for i in range(copies)
        ],
    )
    dim = cust.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100.0).alias("c_acctbal"), "c_mktsegment",
        F.lit("2024-06-01").cast("timestamp").alias("effective_ts"),
    )
    t(lambda: scd2_merge(dim, upd, "c_custkey", ["c_acctbal", "c_mktsegment"]), "scd2_merge")

    # r6 additions: bigram LM scoring (token-pair frame ~= corpus token
    # count — the heaviest text shape), contiguous packing (one window
    # per shard), budget selection (score-bucketed threshold — the
    # boundary cumsum must stay bucket-sized), and PQ training/encoding
    # (n_iter scans, driver traffic O(partitions * m * k))
    t(lambda: llm_text.bigram_surprisal(docs), "bigram_surprisal")
    t(lambda: curation.pack_token_ranges(docs, capacity=512), "pack_ranges")
    t(lambda: curation.budget_select(docs, token_budget=500_000), "budget_select")
    t(lambda: similarity.embed_pq_stats(emb, m=4, k=16, n_iter=2), "pq_stats")

    # r7 additions: DSIR weighting (token-frame shape, like surprisal),
    # RAG chunking (pure codegen single scan — must be ~linear), the
    # trained LR quality filter (n-round vocabulary-free training —
    # driver traffic O(partitions) per round), and BPE merge training
    # (per-round cost is VOCAB-sized: the synthetic corpus's bounded
    # vocabulary keeps rounds flat regardless of corpus copies)
    t(lambda: curation.dsir_importance_weights(docs, target=F.col("source") == "src0"), "dsir_weights")
    t(lambda: llm_text.chunk_documents(docs, chunk_tokens=64, overlap=16), "rag_chunk")
    t(lambda: curation.quality_lr_score(docs, n_iter=20), "quality_lr")
    t(lambda: (lambda mr: spark.createDataFrame(mr[0] or [(0, "", "", 0)], "r int, l string, rt string, n long"))(
        llm_text.bpe_train_merges(docs, n_merges=8)
    ), "bpe_train_8")

    probe_knn_bucketed(spark, emb)
    probe_streaming(spark, copies)


def probe_knn_bucketed(spark, emb) -> None:
    """Corpus-side shuffle elimination: knn_join_ivf against the
    in-memory listed corpus vs the ivf_corpus_table bucketed layout.
    Broadcast is disabled so the probe join's corpus exchange (the cost
    that dominates at 100 TB) is visible; the bucketed scan reads
    bucket-to-bucket and must lose exactly that exchange."""
    tbl = "ivf_corpus_probe"

    def n_exchanges(df) -> int:
        return (
            df._jdf.queryExecution().executedPlan().toString().count("Exchange hashpartitioning")
        )

    t0 = time.time()
    similarity.ivf_corpus_table(emb, tbl)
    build_s = time.time() - t0
    ids, code, fp = similarity.load_ivf_quantizer(spark, f"{tbl}_quantizer")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        mem = similarity.knn_join_ivf(emb, k=10, nprobe=4, codebook=(ids, code))
        bkt = similarity.knn_join_ivf_table(spark, tbl, embeddings=emb, k=10, nprobe=4)
        mem_x, bkt_x = n_exchanges(mem), n_exchanges(bkt)
        t0 = time.time(); mem_n = mem.count(); mem_s = time.time() - t0
        t0 = time.time(); bkt_n = bkt.count(); bkt_s = time.time() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_quantizer")
    print(
        f"knn_join_ivf     in-memory {mem_s:5.2f} s / {mem_x} exchanges vs "
        f"bucketed {bkt_s:5.2f} s / {bkt_x} exchanges "
        f"(+{build_s:.2f} s one-time bucketed build; rows {mem_n:,} == {bkt_n:,})"
    )


def probe_streaming(spark, copies: int) -> None:
    """Keyed-state growth probe: continuous_aggregate and
    streaming_alert_eval over a 1x and a `copies`x event stream
    (device/series space scaled, same time span). Reports the
    state-store row count and trigger latency from the progress
    metrics, so O(series)/O(open-buckets) state is measured rather
    than asserted."""
    import shutil
    import tempfile

    from metrocloud_data_pipeline_spark import streaming

    ev1 = load(spark, SF, "events").select(
        F.col("user_id").alias("device_id"),
        F.col("event_type").alias("device_type"),
        F.col("ts").alias("timestamp"),
        F.col("value").cast("double").alias("value"),
        (F.col("value") > 95.0).alias("is_anomaly"),
        F.lit(50.0).alias("battery_level"),
    )
    sc = "device_id long, device_type string, timestamp timestamp, value double, is_anomaly boolean, battery_level double"

    def run(readings, label):
        tmp = tempfile.mkdtemp(prefix="probe_stream_")
        try:
            src = f"{tmp}/src"
            readings.coalesce(8).write.parquet(src)
            stream = spark.readStream.schema(sc).parquet(src)
            agg = streaming.continuous_aggregate(stream)
            q = (
                agg.writeStream.outputMode("append")
                .format("noop")
                .option("checkpointLocation", f"{tmp}/ck")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            p = q.recentProgress
            state_rows = sum(s["numRowsTotal"] for s in p[-1]["stateOperators"]) if p else -1
            dur = max(x["durationMs"]["triggerExecution"] for x in p) if p else -1
            print(
                f"cont_aggregate   {label:<5} state rows {state_rows:>10,}  "
                f"max trigger {dur/1000:6.2f} s"
            )

            # alert eval over the per-device 5-min condition stream
            bucketed = (
                readings.groupBy(
                    F.window("timestamp", "5 minutes").alias("w"),
                    F.col("device_id").cast("string").alias("series"),
                )
                .agg(F.avg("value").alias("metric"))
                .select(
                    "series", F.col("w.start").alias("bucket"), "metric",
                    (F.col("metric") > 50.0).alias("condition_met"),
                )
            )
            asrc = f"{tmp}/alert_src"
            bucketed.coalesce(8).write.parquet(asrc)
            astream = spark.readStream.schema(
                "series string, bucket timestamp, metric double, condition_met boolean"
            ).parquet(asrc)
            q2 = (
                streaming.streaming_alert_eval(astream, width="5 minutes", for_buckets=3)
                .writeStream.outputMode("append")
                .format("noop")
                .option("checkpointLocation", f"{tmp}/ck2")
                .trigger(availableNow=True)
                .start()
            )
            q2.awaitTermination(600)
            p2 = q2.recentProgress
            state2 = sum(s["numRowsTotal"] for s in p2[-1]["stateOperators"]) if p2 else -1
            dur2 = max(x["durationMs"]["triggerExecution"] for x in p2) if p2 else -1
            print(
                f"alert_eval       {label:<5} state rows {state2:>10,}  "
                f"max trigger {dur2/1000:6.2f} s"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    run(ev1, "1x")
    scaled = reduce(
        lambda a, b: a.unionByName(b),
        [
            ev1.withColumn("device_id", F.col("device_id") + i * OFFSET)
            for i in range(copies)
        ],
    )
    run(scaled, f"{copies}x")


if __name__ == "__main__":
    main()
