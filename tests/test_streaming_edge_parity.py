"""Pathological fixtures through the STREAMING path — the fourth
edge-parity module (documents: test_oracle_edge_parity.py, embeddings:
…_embeddings.py, events: …_events.py cover the BATCH queries; this one
covers the streaming wrappers, which share most code but add their own
null paths: reject accounting, state keys, serving ranks).

The batch twins of these fixtures found four real cross-engine bugs in
r10; running them here found (and now pins the fixes for) five more,
all streaming-only:

1. curate_batch silently DROPPED null-text and null-doc_id rows from
   both kept AND rejected (NULL keys never survive the digest
   equi-join) — violating the module's own fail-loud drop-accounting
   contract (streaming/corpus.py step 0 now routes them to rejected).
2. quality_filter ABORTED the whole micro-batch with an ANSI
   DIVIDE_BY_ZERO on any zero-token doc (empty / whitespace-only
   text), and would silently KEEP a null-text doc (all rules NULL →
   no reason fires) — llm/curation.py now try_divides and rejects
   null text explicitly.
3. alert_columns nulled the ENTIRE alert_message for a CRITICAL alert
   on a null-value reading (concat null-propagation; value is not a
   required ingest field) — streaming/pipeline.py now coalesces every
   nullable piece.
4. the ANN serving streams emitted k ARBITRARY rows with NULL
   cosine_sim for a zero-norm query (NULL-tie ranking accident), and
   the coarse-assignment UDFs tripped numpy zero-divide NaNs on
   zero-norm rows — streaming/ann.py filters undefined similarities;
   llm/similarity.py guards the norms.
5. a NULL-business-key dimension update VANISHED inside scd2_merge's
   change-detection equi-join (neither applied nor reported) —
   operators/maintenance.py now refuses it fail-loud and the SCD2
   stream wrappers split null-key updates to a rejects table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metrocloud_data_pipeline_spark.streaming import ann, corpus

DOC_EDGE_ROWS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "a sufficiently long and varied document about spark pipelines", "en", "s0", 62),
    (2, None, "en", "s0", None),                      # null text
    (3, "", "en", "s0", 0),                           # empty text (0 tokens)
    (4, "   \t  ", "en", "s1", 6),                    # whitespace-only (0 tokens)
    (None, "another perfectly reasonable piece of training text entirely", "en", "s1", 61),
    (6, "A SUFFICIENTLY LONG AND VARIED DOCUMENT ABOUT SPARK PIPELINES", "en", "s2", 62),
    (7, None, "en", "s2", None),                      # second null text
    (8, "repeat " * 50, "en", "s3", 350),             # degenerate TTR
]


def test_curate_batch_accounts_for_every_pathological_row(spark):
    """Every input row lands in exactly ONE of (kept, rejected) — the
    fail-loud accounting contract — even for rows whose doc_id or
    digest is NULL and can therefore never survive an equi-join."""
    batch = spark.createDataFrame(DOC_EDGE_ROWS, corpus.DOCUMENT_SCHEMA)
    kept, rejected = corpus.curate_batch(batch, min_tokens=3)

    kept_ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    rej = {r.doc_id: r.reason for r in rejected.collect()}
    assert kept_ids == [1]
    # 6 is the case-normalized dup of 1; None is the null-doc_id row
    assert rej == {
        2: "null_text",
        3: "too_few_tokens",
        4: "too_few_tokens,mean_token_too_short",
        None: "null_doc_id",
        6: "duplicate_in_batch",
        7: "null_text",
        8: "low_type_token_ratio",
    }
    assert batch.count() == kept.count() + rejected.count()


def test_curate_batch_strict_mode_survives_pathological_rows(spark):
    """The Gopher/C4 panel gates are heavy string HOFs over the batch;
    zero-token and null-text rows must not abort them (they are
    rejected upstream), and accounting stays exact."""
    batch = spark.createDataFrame(DOC_EDGE_ROWS, corpus.DOCUMENT_SCHEMA)
    kept, rejected = corpus.curate_batch(batch, min_tokens=3, quality_mode="strict")
    assert batch.count() == kept.count() + rejected.count()
    # null rows keep their explicit reasons in strict mode too
    rej = {r.doc_id: r.reason for r in rejected.collect()}
    assert rej[2] == "null_text" and rej[None] == "null_doc_id"


def test_corpus_ingest_stream_pathological_batches(spark, tmp_path):
    """End-to-end: two pathological crawl batches through the ingest
    stream. The store holds only the valid survivors, the rejects table
    carries one explicitly-reasoned row per dropped doc (including the
    null-text/null-doc_id rows that used to vanish), and the per-batch
    metrics rows add up."""
    rows2 = [
        (10, None, "en", "s0", None),                 # null text again, batch 2
        (11, "a sufficiently long and varied document about spark pipelines", "en", "s4", 62),  # corpus dup of 1
        (12, "genuinely novel second-batch content about parquet readers", "en", "s4", 59),
    ]
    src = tmp_path / "crawl"
    src.mkdir()
    spark.createDataFrame(DOC_EDGE_ROWS, corpus.DOCUMENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(rows2, corpus.DOCUMENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "b2")
    )

    table = str(tmp_path / "corpus")
    rejects = str(tmp_path / "rejects")
    metrics = str(tmp_path / "metrics")
    q = corpus.run_corpus_ingest_stream(
        corpus.stream_document_files(spark, str(src) + "/*", max_files_per_trigger=1),
        table,
        str(tmp_path / "ck"),
        rejects_path=rejects,
        metrics_path=metrics,
        min_tokens=3,
    )
    q.awaitTermination(120)

    kept = spark.read.parquet(table)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 12]
    assert kept.where(F.col("text").isNull() | F.col("doc_id").isNull()).count() == 0

    rej = spark.read.parquet(rejects)
    reasons = {(r.doc_id, r.batch_id): r.reason for r in rej.collect()}
    assert reasons[(2, 0)] == "null_text"
    assert reasons[(None, 0)] == "null_doc_id"
    assert reasons[(10, 1)] == "null_text"
    assert reasons[(11, 1)] == "duplicate_in_corpus"
    # accounting: input rows == store + rejects
    assert kept.count() + rej.count() == len(DOC_EDGE_ROWS) + len(rows2)

    m = {r.batch_id: r for r in spark.read.parquet(metrics).collect()}
    for b, n_in in ((0, len(DOC_EDGE_ROWS)), (1, len(rows2))):
        assert m[b].n_ingested == n_in
        assert m[b].n_kept + m[b].n_rejected == n_in
    # malformed arrivals counted apart from quality failures: batch 0
    # has 2 null-text + 1 null-doc_id rows, batch 1 has 1 null-text —
    # none of them may inflate the quality counter
    assert m[0].n_invalid == 3 and m[1].n_invalid == 1
    assert m[0].n_quality_rejected == 3  # docs 3, 4, 8
    assert m[1].n_quality_rejected == 0


def test_corpus_ingest_near_dup_screen_survives_pathological_batches(spark, tmp_path):
    """The MinHash-LSH arrival screen bands batch text against the
    standing corpus; null-text rows must be rejected before banding
    (a NULL signature has no bands) and the screen must still catch a
    real near-dup arriving alongside them."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    rows1 = [(1, base, "en", "web", len(base))]
    rows2 = [
        (10, near, "en", "web", len(near)),            # near-dup of 1
        (11, None, "en", "web", None),                  # null text
        (None, "some new arrival with an unusable identity key", "en", "web", 47),
        (13, "genuinely novel second-batch content about parquet readers", "en", "web", 59),
    ]
    src = tmp_path / "crawl"
    src.mkdir()
    spark.createDataFrame(rows1, corpus.DOCUMENT_SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows2, corpus.DOCUMENT_SCHEMA).coalesce(1).write.parquet(str(src / "b2"))

    table = str(tmp_path / "corpus")
    rejects = str(tmp_path / "rejects")
    q = corpus.run_corpus_ingest_stream(
        corpus.stream_document_files(spark, str(src) + "/*", max_files_per_trigger=1),
        table,
        str(tmp_path / "ck"),
        rejects_path=rejects,
        near_dup_screen=True,
        near_dup_threshold=0.8,
        min_tokens=3,
    )
    q.awaitTermination(120)

    assert sorted(r.doc_id for r in spark.read.parquet(table).collect()) == [1, 13]
    reasons = {r.doc_id: r.reason for r in spark.read.parquet(rejects).collect()}
    assert reasons == {
        10: "near_duplicate_in_corpus",
        11: "null_text",
        None: "null_doc_id",
    }


EMB_EDGE_CORPUS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [1.0, 0.0, 0.0, 0.0], 0),      # exact duplicate of 0
    (2, [0.0, 0.0, 0.0, 0.0], 0),      # ZERO vector (failed encoder)
    (3, [-1.0, 0.0, 0.0, 0.0], 1),
    (4, [0.5, 0.5, 0.5, 0.5], 1),
    (5, [1e-8, 0.0, 0.0, 0.0], 0),     # near-zero norm
    (6, [3.0, -4.0, 0.0, 0.0], 2),
    (7, [0.0, 1.0, 0.0, 0.0], 1),
    (8, [0.70710678, 0.70710678, 0.0, 0.0], 0),
    (9, [-0.5, -0.5, -0.5, -0.5], 1),
]


def test_ann_serving_stream_zero_norm_query_and_corpus(spark, tmp_path):
    """A zero-norm QUERY must yield NO result rows (its similarity to
    everything is undefined), not k arbitrary NULL-ranked ones; a
    well-formed query served against a corpus CONTAINING zero-norm
    rows must rank only defined similarities, duplicates included."""
    emb = spark.createDataFrame(
        EMB_EDGE_CORPUS, "vec_id long, embedding array<float>, label int"
    )
    src = tmp_path / "queries"
    src.mkdir()
    spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 0.0, 0.0])],
        ann.QUERY_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1"))

    out = str(tmp_path / "results")
    q = ann.run_ann_serving_stream(
        ann.stream_query_vectors(spark, str(src) + "/*"),
        emb,
        out,
        str(tmp_path / "ck"),
        k=8,
        nprobe=4,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.where(F.col("cosine_sim").isNull()).count() == 0
    assert got.where(F.col("q_id") == 101).count() == 0
    top = got.where(F.col("q_id") == 100).orderBy("rank").collect()
    assert [r.vec_id for r in top[:3]] == [0, 1, 5]   # dup pair + near-zero unit dir
    assert all(r.cosine_sim is not None for r in top)
    # the zero corpus vector never serves as a neighbor
    assert all(r.vec_id != 2 for r in top)


def test_ann_serving_pq_refined_zero_norm_query(spark, tmp_path):
    """The refined (exact cosine re-rank) serving tier under the same
    contract: zero-norm queries emit nothing, defined queries emit only
    non-null sims — with a zero vector present in the indexed corpus."""
    import math

    from metrocloud_data_pipeline_spark.llm import similarity

    rows = []
    for vid in range(60):
        c = vid % 3
        v = [1.0 if i == c else 0.0 for i in range(8)]
        v[(c + 3) % 8] = 0.05 * ((vid * 7) % 11)
        n = math.sqrt(sum(x * x for x in v))
        rows.append((vid, [x / n for x in v], c))
    rows.append((60, [0.0] * 8, 0))                   # zero vector in the corpus
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    tbl = "ivfpq_edge_parity_pytest"
    try:
        similarity.ivfpq_corpus_table(emb, tbl, m=4, pq_k=8, n_iter=4, num_buckets=4)
        src = tmp_path / "queries"
        src.mkdir()
        spark.createDataFrame(
            [(1000, rows[3][1]), (1001, [0.0] * 8)], ann.QUERY_SCHEMA
        ).coalesce(1).write.parquet(str(src / "b1"))

        out = str(tmp_path / "results")
        ann.run_ann_serving_stream_pq(
            spark,
            ann.stream_query_vectors(spark, str(src) + "/*"),
            tbl,
            out,
            str(tmp_path / "ck"),
            k=4,
            nprobe=3,
            refine_factor=3,
            corpus=emb.select("vec_id", "embedding"),
        ).awaitTermination(120)

        got = spark.read.parquet(out)
        assert got.where(F.col("cosine_sim").isNull()).count() == 0
        assert got.where(F.col("q_id") == 1001).count() == 0
        assert got.where(F.col("q_id") == 1000).count() > 0
        assert got.where(F.col("vec_id") == 60).count() == 0
    finally:
        for t in (tbl, f"{tbl}_codebook", f"{tbl}_coarse"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


RAW_EDGE_ROWS = [
    # (device_id, device_type, timestamp, temperature, humidity, pressure,
    #  ax, ay, az, battery_voltage, tx_power, movement, seq)
    ("aa:bb", "ruuvitag", "1758870000", 21.4, 38.5, 101325.0, 0.0, 0.0, 1.0, 2.9, 4.0, 1.0, 1.0),
    (None, "ruuvitag", "1758870001", 22.0, 40.0, 101300.0, 0.0, 0.0, 1.0, 2.8, 4.0, 1.0, 2.0),  # null device
    ("cc:dd", None, "1758870002", 23.0, 41.0, 101200.0, 0.0, 0.0, 1.0, 2.7, 4.0, 1.0, 3.0),     # null type
    ("ee:ff", "ruuvitag", "1758870003", None, None, None, None, None, None, None, None, None, None),  # all-null measures
]


def test_ingest_stream_pathological_raw_accounting(spark, tmp_path):
    """Null device_id / device_type raw messages through the storage
    sink: rejected with explicit reasons, never silently dropped, and
    nothing null lands in the required columns of the store."""
    from metrocloud_data_pipeline_spark.streaming import pipeline

    raw = tmp_path / "raw"
    spark.createDataFrame(
        RAW_EDGE_ROWS,
        "device_id string, device_type string, timestamp string, "
        "temperature double, humidity double, pressure double, "
        "acceleration_x double, acceleration_y double, acceleration_z double, "
        "battery_voltage double, tx_power double, movement_counter double, "
        "measurement_sequence double",
    ).coalesce(1).write.parquet(str(raw))

    table = str(tmp_path / "readings")
    rejects = str(tmp_path / "rejects")
    q = pipeline.run_ingest_stream(
        pipeline.stream_raw_files(spark, str(raw)),
        table,
        str(tmp_path / "ck"),
        rejects_path=rejects,
        anchor="2025-09-26 12:00:00",
    )
    q.awaitTermination(120)

    stored = spark.read.parquet(table)
    assert stored.where(
        F.col("device_id").isNull()
        | F.col("device_type").isNull()
        | F.col("unit").isNull()
    ).count() == 0
    rej = spark.read.parquet(rejects)
    rej_reasons = set(
        rej.select(F.explode("reject_reasons").alias("r")).distinct().toPandas()["r"]
    )
    assert "missing_device_id" in rej_reasons
    assert rej.where(F.col("device_id").isNull()).count() > 0


def test_alert_message_survives_null_value_and_device(spark):
    """A CRITICAL alert on a null-value ERROR reading keeps a readable
    message (value is NOT a required ingest field, so this reaches the
    wired alert stream); a null device_id via direct batch use renders
    the literal 'None' — what the reference's f-strings print for a
    missing field — instead of nulling the line."""
    from metrocloud_data_pipeline_spark.streaming import pipeline

    readings = spark.createDataFrame(
        [
            ("d1", "temperature_sensor", None, "C", "ERROR"),   # null value
            (None, "temperature_sensor", 999.0, "C", "ACTIVE"),  # null device, threshold breach
            ("d3", "temperature_sensor", 21.0, "C", "ACTIVE"),   # no alert
        ],
        "device_id string, device_type string, value double, unit string, status string",
    )
    alerts = pipeline.alert_columns(readings).collect()
    by_dev = {r.device_id: r for r in alerts}
    assert set(by_dev) == {"d1", None}
    assert by_dev["d1"].alert_level == "CRITICAL"
    assert by_dev["d1"].alert_message == "CRITICAL: d1 device_error (value=None C)"
    assert by_dev[None].alert_level == "WARNING"
    assert by_dev[None].alert_message is not None
    assert by_dev[None].alert_message.startswith("WARNING: None")


def test_ann_serving_stream_filtered_corpus(spark, tmp_path):
    """Filtered serving: with corpus_filter set, every served neighbor
    satisfies the predicate, and results equal the batch filtered path
    for the same queries."""
    from metrocloud_data_pipeline_spark.llm import similarity

    emb = spark.createDataFrame(
        EMB_EDGE_CORPUS, "vec_id long, embedding array<float>, label int"
    )
    src = tmp_path / "queries"
    src.mkdir()
    qrows = [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])]
    spark.createDataFrame(qrows, ann.QUERY_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )

    out = str(tmp_path / "results")
    ann.run_ann_serving_stream(
        ann.stream_query_vectors(spark, str(src) + "/*"),
        emb,
        out,
        str(tmp_path / "ck"),
        k=4,
        nprobe=4,
        corpus_filter=F.col("label") == 1,
    ).awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() > 0
    assert got.where(F.col("label") != 1).count() == 0
    # row-for-row equality with the batch filtered path (same trained
    # quantizer seed => same codebook => same probes)
    want = similarity.knn_join_ivf(
        emb,
        k=4,
        nprobe=4,
        queries=spark.createDataFrame(qrows, ann.QUERY_SCHEMA),
        corpus_filter=F.col("label") == 1,
    ).where(F.col("cosine_sim").isNotNull())
    key = lambda t: (t[0], t[1])
    assert sorted(map(tuple, got.drop("batch_id").collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


def test_ann_serving_pq_filtered_codes(spark, tmp_path):
    """Filtered search at the COMPRESSED tier: the codes table built
    with attach_cols=["label"] serves codes_filter queries — every
    refined result's true label satisfies the predicate, and rows
    equal the batch filtered refined path."""
    import math

    from metrocloud_data_pipeline_spark.llm import similarity

    rows = []
    for vid in range(90):
        c = vid % 3
        v = [1.0 if i == c else 0.0 for i in range(8)]
        v[(c + 3) % 8] = 0.05 * ((vid * 7) % 11)
        n = math.sqrt(sum(x * x for x in v))
        rows.append((vid, [x / n for x in v], c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    tbl = "ivfpq_filtered_pytest"
    try:
        similarity.ivfpq_corpus_table(
            emb, tbl, m=4, pq_k=8, n_iter=4, num_buckets=4, attach_cols=["label"]
        )
        assert "label" in spark.table(tbl).columns
        src = tmp_path / "queries"
        src.mkdir()
        qrows = [(1000, rows[3][1]), (1001, rows[50][1])]
        spark.createDataFrame(qrows, ann.QUERY_SCHEMA).coalesce(1).write.parquet(
            str(src / "b1")
        )

        out = str(tmp_path / "results")
        ann.run_ann_serving_stream_pq(
            spark,
            ann.stream_query_vectors(spark, str(src) + "/*"),
            tbl,
            out,
            str(tmp_path / "ck"),
            k=4,
            nprobe=3,
            refine_factor=3,
            corpus=emb.select("vec_id", "embedding"),
            codes_filter=F.col("label") == 2,
        ).awaitTermination(120)

        got = spark.read.parquet(out)
        assert got.count() > 0
        labels = {r.label for r in got.join(emb, "vec_id").select(emb.label).collect()}
        assert labels == {2}

        want = similarity.ivfpq_topk_batch_refined(
            spark.createDataFrame(qrows, ann.QUERY_SCHEMA),
            spark.table(tbl),
            similarity.load_pq_codebook(spark, tbl),
            similarity.load_ivf_quantizer(spark, f"{tbl}_coarse")[:2],
            emb.select("vec_id", "embedding"),
            k=4,
            nprobe=3,
            refine_factor=3,
            codes_filter=F.col("label") == 2,
        ).where(F.col("cosine_sim").isNotNull())
        key = lambda t: (t[0], t[1])
        assert sorted(map(tuple, got.drop("batch_id").collect()), key=key) == sorted(
            map(tuple, want.collect()), key=key
        )
    finally:
        for t in (tbl, f"{tbl}_codebook", f"{tbl}_coarse"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ann_serving_metrics_underfilled_counter(spark, tmp_path):
    """Serving observability: the per-batch metrics row counts queries
    that received fewer than k neighbors — on this batch the zero-norm
    query (0 rows) and, under the label filter, every query (only 4
    label-1 rows exist but k=8), so n_underfilled tracks exactly the
    starvation the recall audit predicts."""
    emb = spark.createDataFrame(
        EMB_EDGE_CORPUS, "vec_id long, embedding array<float>, label int"
    )
    src = tmp_path / "queries"
    src.mkdir()
    spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 0.0, 0.0])],
        ann.QUERY_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1"))

    out = str(tmp_path / "results")
    metrics = str(tmp_path / "metrics")
    ann.run_ann_serving_stream(
        ann.stream_query_vectors(spark, str(src) + "/*"),
        emb,
        out,
        str(tmp_path / "ck"),
        k=8,
        nprobe=4,
        metrics_path=metrics,
    ).awaitTermination(120)

    m = spark.read.parquet(metrics).collect()
    assert len(m) == 1
    row = m[0]
    assert row.n_queries == 2
    got = spark.read.parquet(out)
    assert row.n_results == got.count()
    # query 101 (zero-norm) got 0 rows; query 100 got < 8 defined sims
    # only if fewer than 8 non-null candidates exist — count directly
    full = {r.q_id: r.n for r in got.groupBy("q_id").count().withColumnRenamed("count", "n").collect()}
    expected_underfilled = sum(1 for q in (100, 101) if full.get(q, 0) < 8)
    assert row.n_underfilled == expected_underfilled
    assert row.wall_ms > 0


def test_ann_serving_multi_batch_keeps_all_partitions(spark, tmp_path):
    """Multi-batch effectively-once for the ANN results sink: two query
    files through maxFilesPerTrigger=1 must leave BOTH batch_id
    partitions in the store. The media sink's r13 bug (partition
    overwrite mode set on the outer session instead of the foreachBatch
    clone ran STATIC and wiped prior batches) was invisible to every
    single-batch test — this pins the ANN sink, which already used the
    batch-bound session, against the same regression class."""
    emb = spark.createDataFrame(
        EMB_EDGE_CORPUS, "vec_id long, embedding array<float>, label int"
    )
    src = tmp_path / "queries"
    src.mkdir()
    spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], ann.QUERY_SCHEMA
    ).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(
        [(101, [0.0, 1.0, 0.0, 0.0])], ann.QUERY_SCHEMA
    ).coalesce(1).write.parquet(str(src / "b"))

    out = str(tmp_path / "results")
    q = ann.run_ann_serving_stream(
        ann.stream_query_vectors(spark, str(src) + "/*", max_files_per_trigger=1),
        emb,
        out,
        str(tmp_path / "ck"),
        k=3,
        nprobe=4,
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = spark.read.parquet(out)
    assert sorted(r[0] for r in got.select("batch_id").distinct().collect()) == [0, 1]
    assert sorted(r[0] for r in got.select("q_id").distinct().collect()) == [100, 101]


def test_ann_serving_metrics_survive_empty_first_batch(spark, tmp_path):
    """ADVICE r11: when the FIRST micro-batch produces zero result rows
    (here: its only query is zero-norm, so every similarity is NULL and
    the validity filter drops everything), the dynamic-partition write
    emits no parquet files — the metrics read-back used to die on
    'unable to infer schema' and kill the stream on exactly the
    degenerate batch the metrics exist to surface. It must instead
    record n_results=0 with every query counted underfilled."""
    emb = spark.createDataFrame(
        EMB_EDGE_CORPUS, "vec_id long, embedding array<float>, label int"
    )
    src = tmp_path / "queries"
    src.mkdir()
    spark.createDataFrame(
        [(100, [0.0, 0.0, 0.0, 0.0])], ann.QUERY_SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1"))

    metrics = str(tmp_path / "metrics")
    q = ann.run_ann_serving_stream(
        ann.stream_query_vectors(spark, str(src) + "/*"),
        emb,
        str(tmp_path / "results"),
        str(tmp_path / "ck"),
        k=4,
        nprobe=4,
        metrics_path=metrics,
    )
    q.awaitTermination(120)
    assert q.exception() is None
    m = spark.read.parquet(metrics).collect()
    assert len(m) == 1
    assert (m[0].n_queries, m[0].n_results, m[0].n_underfilled) == (1, 0, 1)


def test_ann_serving_stream_escalates_underfilled(spark, tmp_path):
    """The closed loop for filter starvation (VERDICT r11 #2): with
    nprobe=1 and a label filter selecting one cluster, queries sitting
    in the other clusters get ZERO rows from the plain filtered stream;
    with underfill_escalation="brute" every served query returns its k
    TRUE filtered neighbors, and re-delivery semantics are untouched."""
    import math

    from metrocloud_data_pipeline_spark.llm import similarity

    rows = []
    for vid in range(90):
        c = vid % 3
        v = [1.0 if i == c else 0.0 for i in range(8)]
        v[(c + 3) % 8] = 0.05 * ((vid * 7) % 11)
        n = math.sqrt(sum(x * x for x in v))
        rows.append((vid, [x / n for x in v], c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    src = tmp_path / "queries"
    src.mkdir()
    # queries in clusters 0 and 1 — their single probed list is emptied
    # by the label==2 filter — plus one in cluster 2 (well-filled)
    qrows = [(1000, rows[0][1]), (1001, rows[1][1]), (1002, rows[2][1])]
    spark.createDataFrame(qrows, ann.QUERY_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )

    plain_out = str(tmp_path / "plain")
    ann.run_ann_serving_stream(
        ann.stream_query_vectors(spark, str(src) + "/*"),
        emb,
        plain_out,
        str(tmp_path / "ck_plain"),
        k=5,
        nprobe=1,
        train_k=3,
        corpus_filter=F.col("label") == 2,
    ).awaitTermination(120)
    plain = spark.read.parquet(plain_out)
    # starvation is real on the plain stream: the cluster-0/1 queries
    # got nothing back, silently
    assert plain.where(F.col("q_id").isin([1000, 1001])).count() == 0

    out = str(tmp_path / "results")
    ann.run_ann_serving_stream(
        ann.stream_query_vectors(spark, str(src) + "/*"),
        emb,
        out,
        str(tmp_path / "ck"),
        k=5,
        nprobe=1,
        train_k=3,
        corpus_filter=F.col("label") == 2,
        underfill_escalation="brute",
    ).awaitTermination(120)
    got = spark.read.parquet(out)
    counts = {r.q_id: r.n for r in got.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1000: 5, 1001: 5, 1002: 5}, counts
    assert got.where(F.col("label") != 2).count() == 0
    # escalated rows ARE the exact filtered answer for the starved queries
    want = similarity.knn_join_brute(
        emb, k=5, corpus_filter=F.col("label") == 2,
        queries=spark.createDataFrame(qrows, ann.QUERY_SCHEMA),
    ).where(F.col("q_id").isin([1000, 1001]))
    key = lambda t: (t[0], t[1])
    assert sorted(
        map(tuple, got.where(F.col("q_id").isin([1000, 1001])).drop("batch_id").collect()),
        key=key,
    ) == sorted(map(tuple, want.collect()), key=key)


def test_scd2_null_business_key_rejected_not_vanished(spark, tmp_path):
    """A NULL business key has no identity to version: scd2_merge
    previously let it VANISH at the change-detection equi-join (same
    class as curate_batch's null-digest drop). Now the merge refuses it
    fail-loud, and the stream wrapper splits it to a rejects table
    while the valid updates apply."""
    from metrocloud_data_pipeline_spark.operators.maintenance import scd2_merge
    from metrocloud_data_pipeline_spark.streaming import dim as dimmod

    dim = spark.createDataFrame(
        [(1, "gold", "2025-01-01 00:00:00", None)],
        "c_custkey long, tier string, valid_from string, valid_to string",
    ).select(
        "c_custkey",
        "tier",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame(
        [(1, "silver", "2025-02-01 00:00:00"), (None, "ghost", "2025-02-01 00:00:00")],
        "c_custkey long, tier string, effective_ts string",
    ).select(
        "c_custkey", "tier", F.col("effective_ts").cast("timestamp").alias("effective_ts")
    )
    with pytest.raises(ValueError, match="NULL 'c_custkey' business key"):
        scd2_merge(dim, updates, "c_custkey", ["tier"])

    # stream wrapper: null-key update lands in rejects, the rest apply
    dim_path = str(tmp_path / "dim")
    dim.write.parquet(dim_path)
    src = tmp_path / "updates"
    src.mkdir()
    updates.coalesce(1).write.parquet(str(src / "b1"))
    rejects = str(tmp_path / "rejects")
    q = dimmod.run_scd2_stream(
        spark.readStream.schema(
            "c_custkey long, tier string, effective_ts timestamp"
        ).parquet(str(src) + "/*"),
        dim_path,
        str(tmp_path / "ck"),
        "c_custkey",
        ["tier"],
        rejects_path=rejects,
    )
    q.awaitTermination(120)

    out = spark.read.parquet(dim_path)
    # key 1 versioned: gold closed, silver open; no ghost row anywhere
    assert out.count() == 2
    assert out.where(F.col("c_custkey").isNull()).count() == 0
    rej = spark.read.parquet(rejects).collect()
    assert len(rej) == 1 and rej[0].reason == "null_business_key"
    assert rej[0].tier == "ghost"


def test_media_feature_stream_isolates_decode_errors(spark, tmp_path):
    """The multimodal tier's accounting law (r12): a pathological media
    micro-batch — truncated WAV, junk-bytes audio, video, null payload,
    null media_id — must land every row in exactly ONE of (features,
    rejected-with-reason), and a per-row decode failure must NOT kill
    the stream (the batch errors='raise' contract inverted for
    continuous arrival)."""
    import math
    import struct
    import wave
    from io import BytesIO

    from metrocloud_data_pipeline_spark.streaming.media import (
        MEDIA_STREAM_SCHEMA,
        featurize_media_batch,
        run_media_feature_stream,
    )

    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(0.5 * 32767 * math.sin(2 * math.pi * 1000 * i / 8000)))
                for i in range(2000)
            )
        )
    good_wav = buf.getvalue()
    import numpy as np

    from metrocloud_data_pipeline_spark.llm import multimodal as mm

    good_avi = mm._avi_encode(np.full((2, 3, 4, 3), 128, dtype=np.uint8))
    rows = [
        (0, "audio", "audio/wav", bytearray(good_wav), None, None, 250),
        (1, "audio", "audio/wav", bytearray(good_wav[:20]), None, None, 250),  # cut header
        (2, "audio", "audio/mpeg", bytearray(b"ID3\x04junk"), None, None, 250),
        (3, "video", "video/mp4", bytearray(b"MP4"), None, None, 3000),
        (4, "audio", "audio/wav", None, None, None, 250),                       # null payload
        (None, "audio", "audio/wav", bytearray(good_wav), None, None, 250),     # null id
        (6, "video", "video/avi", bytearray(good_avi), None, None, 80),         # decodable
        (7, "image", "image/jpeg", bytearray(b"\xff\xd8\xff\xe0JFIF"), 2, 2, None),  # non-PNG
    ]
    batch = spark.createDataFrame(rows, MEDIA_STREAM_SCHEMA)

    def _has_pil():
        try:
            import PIL  # noqa: F401
            return True
        except ImportError:
            return False

    # a PIL-present host decodes the JPEG junk far enough for PIL to
    # reject it (a data error); a PIL-less host rejects it as a
    # missing codec — EITHER way it must land in rejects, and only the
    # codec-missing case counts in n_codec_missing
    pil = _has_pil()

    # pure batch form first (the unit-testable half)
    kept, rejected = featurize_media_batch(batch, decode_stub=False, dim=8)
    assert sorted(r["media_id"] for r in kept.collect()) == [0, 6]
    reasons = {r["media_id"]: r["reason"] for r in rejected.collect()}
    assert reasons[3] == "video_needs_ffmpeg"  # static gate: no RIFF magic
    assert reasons[4] == "null_payload"
    assert reasons[None] == "null_media_id"
    assert "NotImplementedError" in reasons[1]  # truncated RIFF
    assert "NotImplementedError" in reasons[2]  # junk bytes
    assert 7 in reasons  # non-PNG image: codec-missing or PIL data error
    if not pil:
        assert "PIL" in reasons[7]
    assert len(reasons) == 6

    # stream wrapper: same batch through foreachBatch + all three sinks
    src = tmp_path / "uploads"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b1"))
    out = str(tmp_path / "features")
    rejects = str(tmp_path / "rejects")
    metrics = str(tmp_path / "metrics")
    q = run_media_feature_stream(
        spark,
        str(src) + "/*",
        out,
        str(tmp_path / "ck"),
        rejects_path=rejects,
        metrics_path=metrics,
        decode_stub=False,
        dim=8,
    )
    q.awaitTermination(120)

    feats = spark.read.parquet(out).collect()
    assert sorted(r.media_id for r in feats) == [0, 6]
    assert all(len(r.feature) == 8 for r in feats)
    rej = spark.read.parquet(rejects)
    assert rej.count() == 6
    m = spark.read.parquet(metrics).collect()[0]
    assert (m.n_items, m.n_features, m.n_rejected, m.n_invalid, m.n_decode_errors) == (
        8, 2, 6, 2, 3,
    )
    # the missing-codec breakout (ADVICE r12): the deployment-error
    # signal is a metrics column, not a grep through reject reasons
    assert m.n_codec_missing == (0 if pil else 1)


def test_media_feature_stream_redelivery_is_effectively_once(spark, tmp_path):
    """The features sink's effectively-once claim, exercised: replaying
    the same input through a FRESH checkpoint (the classic redelivery
    shape) rewrites exactly the same batch_id partition with identical
    rows — no duplicates, no drift."""
    import math
    import struct
    import wave
    from io import BytesIO

    from metrocloud_data_pipeline_spark.streaming.media import run_media_feature_stream

    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(0.4 * 32767 * math.sin(2 * math.pi * 500 * i / 8000)))
                for i in range(1600)
            )
        )
    src = tmp_path / "uploads"
    src.mkdir()
    spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(buf.getvalue()), None, None, 200)],
        "media_id long, media_type string, mime string, payload binary, "
        "width int, height int, duration_ms int",
    ).coalesce(1).write.parquet(str(src / "b1"))
    out = str(tmp_path / "features")

    for attempt in ("ck1", "ck2"):  # second run = redelivery
        q = run_media_feature_stream(
            spark, str(src) + "/*", out, str(tmp_path / attempt),
            decode_stub=False, dim=8,
        )
        q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].media_id == 1  # overwritten, not doubled
    assert len(rows[0].feature) == 8


def _tone_wav(freq: int, n: int = 1600) -> bytes:
    import math
    import struct
    import wave
    from io import BytesIO

    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(0.4 * 32767 * math.sin(2 * math.pi * freq * i / 8000)))
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_media_feature_stream_dedups_payloads_across_batches(spark, tmp_path):
    """The media stream's exact-dedup tier (VERDICT r12 #7): a payload
    planted in a LATER micro-batch that byte-matches one already in the
    features store must reject as duplicate_payload_in_store (and an
    in-batch twin as duplicate_payload_in_batch) — pre-decode, by a
    JVM-side digest join — while the accounting law (every input row in
    exactly one of features/rejects) and the n_duplicates metrics
    breakout extend to the new reject class. Then the whole input
    replays through a FRESH checkpoint (redelivery): with the current
    batch_id partition excluded from the store-side anti-join, the
    replay rewrites identical partitions instead of rejecting its own
    prior output."""
    from metrocloud_data_pipeline_spark.streaming.media import run_media_feature_stream

    wav_a, wav_b, wav_c = _tone_wav(500), _tone_wav(1000), _tone_wav(1500)
    schema = (
        "media_id long, media_type string, mime string, payload binary, "
        "width int, height int, duration_ms int"
    )
    src = tmp_path / "uploads"
    src.mkdir()
    spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(wav_a), None, None, 200),
         (2, "audio", "audio/wav", bytearray(wav_b), None, None, 200)],
        schema,
    ).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(
        [(3, "audio", "audio/wav", bytearray(wav_a), None, None, 200),  # store dup
         (4, "audio", "audio/wav", bytearray(wav_c), None, None, 200),
         (5, "audio", "audio/wav", bytearray(wav_c), None, None, 200),  # batch dup
         # double-delivered row: SAME media_id, same payload — keep-min
         # by id alone cannot split these; the row_number split must
         # (review r13)
         (4, "audio", "audio/wav", bytearray(wav_c), None, None, 200)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b"))

    out = str(tmp_path / "features")
    rejects = str(tmp_path / "rejects")
    metrics = str(tmp_path / "metrics")
    q = run_media_feature_stream(
        spark, str(src) + "/*", out, str(tmp_path / "ck1"),
        rejects_path=rejects, metrics_path=metrics,
        decode_stub=False, dim=8, max_files_per_trigger=1, dedup=True,
    )
    q.awaitTermination(120)
    assert q.exception() is None

    feats = spark.read.parquet(out)
    assert sorted(r.media_id for r in feats.collect()) == [1, 2, 4]
    rej = sorted(
        ((r.media_id, r.reason) for r in spark.read.parquet(rejects).collect())
    )
    assert rej == [
        (3, "duplicate_payload_in_store"),
        (4, "duplicate_payload_in_batch"),  # the double-delivered twin
        (5, "duplicate_payload_in_batch"),
    ]
    ms = {r.batch_id: r for r in spark.read.parquet(metrics).collect()}
    for r in ms.values():  # accounting law holds per batch
        assert r.n_items == r.n_features + r.n_rejected
        assert r.n_decode_errors == 0  # dupes are NOT data errors
    assert sorted(r.n_duplicates for r in ms.values()) == [0, 3]

    # redelivery: full replay through a fresh checkpoint must rewrite
    # identical partitions, not anti-join against its own prior write
    before = sorted(
        map(tuple, feats.select("media_id", "content_hash", "batch_id").collect())
    )
    q2 = run_media_feature_stream(
        spark, str(src) + "/*", out, str(tmp_path / "ck2"),
        rejects_path=rejects, metrics_path=metrics,
        decode_stub=False, dim=8, max_files_per_trigger=1, dedup=True,
    )
    q2.awaitTermination(120)
    assert q2.exception() is None
    after = sorted(
        map(tuple, spark.read.parquet(out)
            .select("media_id", "content_hash", "batch_id").collect())
    )
    assert after == before


@pytest.mark.slow
def test_media_feature_stream_near_dup_screen(spark, tmp_path):
    """The media stream's arrival-time NEAR-dup tier (r15 — the corpus
    MinHash screen re-expressed over content fingerprints): a later
    batch delivering a RE-ENCODED audio copy (24-bit widening — bytes
    differ, decoded signal identical) and a RE-CONTAINERED video copy
    (rec-LIST rewrap — bytes differ, decoded frames identical) and a
    BRIGHTNESS-SHIFTED image copy (+4 every pixel — bytes and pixels
    differ, dHash identical) of items
    already in the features store must reject all three as
    near_duplicate_in_store BEFORE the feature decode — exactly the
    copy class the byte-digest tier structurally misses — while fresh
    content passes. The maintained print
    index holds only KEPT items, the n_near_dup metrics breakout lands
    at the end of the schema, and a full fresh-checkpoint replay
    rewrites identical partitions (the batch_id exclusion on both the
    content_hash read and the print-index read)."""
    import numpy as np

    from metrocloud_data_pipeline_spark.llm import multimodal as mm
    from metrocloud_data_pipeline_spark.streaming.media import (
        run_media_feature_stream,
    )

    # >= one full 250 ms fingerprint window (a shorter clip drops its
    # trailing partial window and carries no prints by design)
    wav_a, wav_c = _tone_wav(500, n=4000), _tone_wav(1500, n=4000)
    avi_v2 = mm._avi_encode(
        np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    )
    def grad_png(doc_id):
        # the gradient-synth construction: dHash == doc_id exactly
        g = np.empty((8, 9), dtype="int64")
        g[:, 0] = 128
        for r in range(8):
            for c in range(8):
                bit = (doc_id >> (r * 8 + c)) & 1
                g[r, c + 1] = g[r, c] + (8 if bit else -8)
        return mm._png_encode(np.repeat(g.astype("uint8")[:, :, None], 3, axis=2))

    png_0 = grad_png(1023)
    png_6 = grad_png(77)          # distinct hash from png_0
    png_7 = mm._png_encode(       # +4 brightness copy of png_0: bytes
        (mm._png_decode(png_0).astype("int64") + 4).astype("uint8")
    )                             # and pixels differ, dHash identical
    schema = (
        "media_id long, media_type string, mime string, payload binary, "
        "width int, height int, duration_ms int"
    )
    src = tmp_path / "uploads"
    src.mkdir()
    spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(wav_a), None, None, 200),
         (2, "video", "video/avi", bytearray(avi_v2), 4, 3, None),
         (0, "image", "image/png", bytearray(png_0), 9, 8, None)],
        schema,
    ).coalesce(1).write.parquet(str(src / "a"))
    reenc = mm.reencode_wav(wav_a)
    recont = mm.recontainer_avi(avi_v2)
    assert reenc != wav_a and recont != avi_v2  # exact tier CANNOT match
    spark.createDataFrame(
        [(3, "audio", "audio/wav", bytearray(reenc), None, None, 200),
         (4, "audio", "audio/wav", bytearray(wav_c), None, None, 200),
         (5, "video", "video/avi", bytearray(recont), 4, 3, None),
         (6, "image", "image/png", bytearray(png_6), 9, 8, None),
         (7, "image", "image/png", bytearray(png_7), 9, 8, None)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b"))

    out = str(tmp_path / "features")
    rejects = str(tmp_path / "rejects")
    metrics = str(tmp_path / "metrics")
    prints = str(tmp_path / "print_index")

    # the gate refuses a screen without its exact tier / index
    with pytest.raises(ValueError, match="requires"):
        run_media_feature_stream(
            spark, str(src) + "/*", out, str(tmp_path / "ck0"),
            near_dup_screen=True, dedup=False, print_index_path=prints,
        )

    q = run_media_feature_stream(
        spark, str(src) + "/*", out, str(tmp_path / "ck1"),
        rejects_path=rejects, metrics_path=metrics,
        decode_stub=False, dim=8, max_files_per_trigger=1, dedup=True,
        near_dup_screen=True, print_index_path=prints,
    )
    q.awaitTermination(120)
    assert q.exception() is None

    feats = spark.read.parquet(out)
    assert sorted(r.media_id for r in feats.collect()) == [0, 1, 2, 4, 6]
    rej = sorted(
        (r.media_id, r.reason) for r in spark.read.parquet(rejects).collect()
    )
    assert rej == [
        (3, "near_duplicate_in_store"),
        (5, "near_duplicate_in_store"),
        (7, "near_duplicate_in_store"),  # brightness copy: dHash match
    ]
    # the index holds the KEPT items' prints only, namespaced per tier
    idx = spark.read.parquet(prints)
    by_id = {
        r.media_id: r.n
        for r in idx.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert sorted(by_id) == [0, 1, 2, 4, 6]  # rejected copies never index
    namespaces = {r.ns for r in idx.select(
        F.substring("fp", 1, 2).alias("ns")).distinct().collect()}
    assert namespaces == {"a:", "v:", "i:"}
    ms = {r.batch_id: r for r in spark.read.parquet(metrics).collect()}
    for r in ms.values():  # accounting law holds per batch
        assert r.n_items == r.n_features + r.n_rejected
        assert r.n_decode_errors == 0  # near-dups are NOT data errors
    assert sorted(r.n_near_dup for r in ms.values()) == [0, 3]
    assert all(r.n_duplicates == 0 for r in ms.values())

    # full fresh-checkpoint replay: identical partitions, no self-match
    before = sorted(
        map(tuple, feats.select("media_id", "content_hash", "batch_id").collect())
    )
    q2 = run_media_feature_stream(
        spark, str(src) + "/*", out, str(tmp_path / "ck2"),
        rejects_path=rejects, metrics_path=metrics,
        decode_stub=False, dim=8, max_files_per_trigger=1, dedup=True,
        near_dup_screen=True, print_index_path=prints,
    )
    q2.awaitTermination(120)
    assert q2.exception() is None
    after = sorted(
        map(tuple, spark.read.parquet(out)
            .select("media_id", "content_hash", "batch_id").collect())
    )
    assert after == before
