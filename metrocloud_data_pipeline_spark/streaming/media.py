"""Streaming multimodal feature extraction — micro-batched media
decode with per-row error isolation (SURVEY §2.23).

The batch path (llm/multimodal.extract_features) answers "featurize
this curated corpus", where an undecodable payload means a broken
upstream and errors='raise' is right. A continuous ARRIVAL of media
items (a crawl frontier, an upload bus) inverts that: one truncated
WAV in a million rows must not kill the stream, and — the corpus
stream's accounting law — every input row must land in exactly ONE of
(features, rejected), with a reason. This wires the lenient decode
mode into Structured Streaming the same way corpus ingest and ANN
serving do:

- step-0 validity split BEFORE any Python: null media_id (no identity
  for downstream dedup/joins) and null payload (a data error, not a
  missing codec) route to the rejects sink with explicit reasons;
- a static type gate keeps rows whose decode cannot succeed (video
  without the RIFF magic: compressed containers need ffmpeg, which is
  deliberately not gated in) out of the Python workers entirely —
  rejected by a column expression, zero Arrow transfer;
- surviving rows run extract_features(errors='reject'): a row whose
  payload fails its decoder (truncated RIFF, junk bytes, a corrupt
  PNG) keeps its identity, carries the exception text, and joins the
  rejects; the batch survives. That isolation covers MISSING-CODEC
  failures too: in a PIL-less deployment every non-PNG image row lands
  in the rejects with the "needs PIL" NotImplementedError text rather
  than killing the stream — a deployment error therefore surfaces as a
  sudden spike of one reject reason, and the per-batch metrics break
  out n_codec_missing so that spike is a dashboard line, not a grep;
- the features sink is effectively-once via dynamic partition
  overwrite keyed by batch_id (the ANN-serving shape: the partition
  key fully identifies the write, so a re-delivered micro-batch
  rewrites exactly its own partition with identical rows);
- rejects and per-batch metrics are append-only observability logs
  (dedup by batch_id at read time), metrics columns appended at the
  END of the schema per the r12 discipline.

At 100 TB the decode work is map-only over Arrow batches (bytes cross
the JVM<->Python boundary once per batch), there is no shuffle
anywhere in the hot path, and the store never rescans — per trigger
the only moving data is the micro-batch itself.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pyspark.sql.types import StructField, StructType

from ..llm.multimodal import MEDIA_SCHEMA, extract_features

REJECT_SCHEMA = "media_id long, media_type string, reason string"

# a dirty feed is the POINT of the validity split: the stream reader
# accepts nulls everywhere (the batch schema's media_id is declared
# non-null, which is true of curated tables but not of an upload bus)
MEDIA_STREAM_SCHEMA = StructType(
    [StructField(f.name, f.dataType, True) for f in MEDIA_SCHEMA.fields]
)


def stream_media_items(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based media-item stream (stands in for the upload bus;
    swap for a Kafka reader in a deployed tier)."""
    reader = spark.readStream.schema(MEDIA_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def featurize_media_batch(
    batch: DataFrame, decode_stub: bool = False, dim: int = 8,
    checkpoint: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of media featurization -> (features,
    rejected-with-reason). Pure batch-DataFrame logic (the curate_batch
    pattern) so it is unit-testable outside streaming and reusable for
    backfills. Every input row lands in exactly one output.

    checkpoint=True localCheckpoints the ONE frame that carries the
    Python decode lineage (the lenient extract_features output) before
    kept/rejected split from it, so a caller with multiple consumers
    (sink + metrics) pays the decode exactly once per micro-batch; the
    validity/type rejects are column expressions on the raw batch and
    stay lazy either way."""
    # 0. fail-loud validity split, before any Python worker sees a row
    invalid = batch.where(F.col("media_id").isNull() | F.col("payload").isNull())
    invalid_rejects = invalid.select(
        "media_id",
        "media_type",
        F.when(F.col("media_id").isNull(), F.lit("null_media_id"))
        .otherwise(F.lit("null_payload"))
        .alias("reason"),
    )
    valid = batch.where(F.col("media_id").isNotNull() & F.col("payload").isNotNull())

    # 1. static type gate: rows that CANNOT decode never reach Python.
    # Video decodes for real only from an uncompressed-DIB AVI (a RIFF
    # container, r12) — anything without the RIFF magic is compressed
    # or foreign and is rejected by a column expression, zero Arrow
    # transfer (a RIFF payload can still fail per-row in step 2, e.g.
    # an MJPG-coded AVI).
    if decode_stub:
        decodable = valid
        type_rejects = valid.limit(0).select(
            "media_id", "media_type", F.lit("").alias("reason")
        )
    else:
        is_undecodable_video = (F.col("media_type") == "video") & (
            F.substring(F.col("payload"), 1, 4) != F.lit(b"RIFF")
        )
        decodable = valid.where(~is_undecodable_video)
        type_rejects = valid.where(is_undecodable_video).select(
            "media_id",
            "media_type",
            F.lit("video_needs_ffmpeg").alias("reason"),
        )

    # 2. per-row lenient decode: failures keep identity + exception text
    feats = extract_features(decodable, decode_stub=decode_stub, dim=dim, errors="reject")
    if checkpoint:
        feats = feats.localCheckpoint()
    kept = feats.where(F.col("decode_error").isNull()).drop("decode_error")
    decode_rejects = feats.where(F.col("decode_error").isNotNull()).select(
        "media_id", "media_type", F.col("decode_error").alias("reason")
    )

    rejected = invalid_rejects.unionByName(type_rejects).unionByName(decode_rejects)
    return kept, rejected


def run_media_feature_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    rejects_path: str | None = None,
    metrics_path: str | None = None,
    decode_stub: bool = False,
    dim: int = 8,
    max_files_per_trigger: int | None = None,
    once: bool = True,
) -> StreamingQuery:
    """Continuous media featurization: parquet media items in,
    effectively-once feature rows out, rejects + metrics logs on the
    side. See the module docstring for the semantics."""
    from ..operators.maintenance import dynamic_partition_overwrite

    items = stream_media_items(spark, input_path, max_files_per_trigger)

    def _process(batch: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        # checkpoint=True freezes the decode lineage ONCE inside
        # featurize_media_batch; kept/rejected and the metrics
        # aggregates below all derive from that one materialization
        # (cheap column ops), so the Python decode runs exactly once
        # per micro-batch
        kept, rejected = featurize_media_batch(
            batch, decode_stub=decode_stub, dim=dim, checkpoint=True
        )
        with dynamic_partition_overwrite(spark):
            (
                kept.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(output_path)
            )
        if rejects_path is not None:
            (
                rejected.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(rejects_path)
            )
        if metrics_path is not None:
            n_kept = kept.count()
            by_reason = {
                r["reason"]: r["n"]
                for r in rejected.groupBy("reason")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()  # bounded: one row per distinct reject reason
            }
            n_rejected = sum(by_reason.values())
            n_invalid = by_reason.get("null_media_id", 0) + by_reason.get(
                "null_payload", 0
            )
            n_decode_errors = n_rejected - n_invalid - by_reason.get(
                "video_needs_ffmpeg", 0
            )
            # missing-codec rejects ("... need PIL") broken out so a
            # PIL-less deployment reads as ONE spiking metric line, not
            # a grep through reject reasons (the per-row isolation
            # contract absorbs them as data rejects by design — this
            # column is how the deployment error still surfaces).
            # Appended at the END of the schema per the r12 discipline.
            n_codec_missing = sum(
                n for reason, n in by_reason.items() if "PIL" in reason
            )
            spark.createDataFrame(
                [(
                    batch_id,
                    n_kept + n_rejected,
                    n_kept,
                    n_rejected,
                    n_invalid,
                    n_decode_errors,
                    int((time.monotonic() - t0) * 1000),
                    n_codec_missing,
                )],
                "batch_id long, n_items long, n_features long, n_rejected long, "
                "n_invalid long, n_decode_errors long, wall_ms long, "
                "n_codec_missing long",
            ).write.mode("append").parquet(metrics_path)

    writer = items.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if once:
        return writer.trigger(availableNow=True).start()
    return writer.start()
