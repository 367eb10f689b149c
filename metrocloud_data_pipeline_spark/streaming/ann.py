"""Streaming ANN serving — micro-batched vector search against a
standing IVF corpus (SURVEY §2.16).

The batch ANN operators (llm/similarity.py) answer "neighbors of the
corpus within itself"; a serving tier answers a continuous ARRIVAL of
external query vectors. This wires knn_join_ivf's external-query mode
into Structured Streaming the same way corpus ingest does: a file
source of query batches feeds foreachBatch, and each micro-batch is
scored against the pre-built corpus layout:

- the IVF codebook is derived from the CORPUS (deterministic stride
  sample), so every micro-batch probes the same lists the corpus was
  listed by;
- with `corpus_table` a bucketed ivf_corpus_table, the corpus side of
  the probe join reads bucket-to-bucket — per batch the only moving
  data is the (small) query band: batch rows broadcast, corpus rows
  never shuffle. At 100 TB this is the difference between a serving
  tier and a nightly job;
- results land in parquet partitioned by batch_id with DYNAMIC
  partition overwrite: a re-delivered micro-batch rewrites exactly its
  own partition with identical (deterministic) content, so the sink is
  effectively-once without any read-back — stronger than the
  append+anti-join shape corpus ingest needs, because here the
  partition key (batch_id) fully identifies the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..llm.similarity import knn_join_ivf

QUERY_SCHEMA = "vec_id long, embedding array<float>"


def stream_query_vectors(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based query-vector stream (stands in for the request bus;
    swap for a Kafka reader in a deployed serving tier)."""
    reader = spark.readStream.schema(QUERY_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def run_ann_serving_stream(
    query_stream: DataFrame,
    corpus: DataFrame,
    output_path: str,
    checkpoint_path: str,
    k: int = 10,
    nprobe: int = 4,
    stride: int = 31,
    corpus_table: DataFrame | None = None,
    available_now: bool = True,
    codebook=None,
) -> StreamingQuery:
    """Score each micro-batch of query vectors against the corpus and
    append (batch_id, q_id, vec_id, label, cosine_sim, rank) rows.

    Pass corpus_table (an ivf_corpus_table built with the SAME stride)
    to skip per-batch corpus re-listing AND make the corpus side of
    every batch's probe join exchange-free. Pass `codebook` (e.g.
    similarity.trained_codebook — train ONCE at deploy, serve forever)
    to replace the stride quantizer: on clustered corpora the trained
    codebook holds recall ~1.0 where stride degrades with corpus size
    (PROBE_r06); the per-batch cost is identical."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        result = knn_join_ivf(
            corpus,
            k=k,
            nprobe=nprobe,
            stride=stride,
            listed=corpus_table,
            queries=batch.select("vec_id", "embedding"),
            codebook=codebook,
        )
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # dynamic overwrite touches ONLY partition batch_id=<this>:
            # a re-delivered batch rewrites its own partition with the
            # same deterministic rows — effectively-once, no read-back
            (
                result.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(output_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = query_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
