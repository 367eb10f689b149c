"""Streaming dimension maintenance — SCD2 MERGE per micro-batch.

Dimension updates arrive continuously (device registry changes,
customer-attribute edits); the warehouse keeps full version history.
This wires operators/maintenance.scd2_merge into foreachBatch the same
way corpus ingest wires curate_batch:

- each micro-batch is reduced to LATEST-update-per-key first (several
  updates for one key within a batch collapse to the newest by
  effective_ts — scd2_merge's one-per-key contract);
- the standing dimension store is read, merged, and replaced via the
  crash-recoverable staging swap (maintenance.swap_store: live dir
  renamed aside, staging promoted, aside dropped — one complete copy
  exists at every crash point, and recover_store() at batch start
  repairs an interrupted swap; a dimension is small next to facts, so
  full rewrite per batch is the standard lakehouse MERGE cost);
- re-delivered batches are harmless: merging the same updates twice is
  a no-op by construction (the second pass sees attributes identical
  to the now-current versions and drops them), so the sink is
  effectively-once WITHOUT any txn machinery — idempotence lives in
  the MERGE semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.maintenance import recover_store, scd2_merge, swap_store


def latest_per_key(updates: DataFrame, key_col: str, effective_col: str) -> DataFrame:
    """Collapse a batch to one update per key: newest effective_ts wins,
    ties broken by the largest attribute tuple for determinism."""
    from pyspark.sql.window import Window

    others = [c for c in updates.columns if c not in (key_col, effective_col)]
    w = Window.partitionBy(key_col).orderBy(
        F.desc(effective_col), *[F.desc(c) for c in others]
    )
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_scd2_stream(
    update_stream: DataFrame,
    dim_path: str,
    checkpoint_path: str,
    key_col: str,
    attr_cols: list[str],
    effective_col: str = "effective_ts",
    available_now: bool = True,
) -> StreamingQuery:
    """Apply each micro-batch of updates to the versioned dimension at
    dim_path. The store must exist (seed it with the initial dimension,
    valid_to NULL) before the stream starts."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        # a prior run may have died mid-swap — restore the aside copy
        # before reading, so the retried batch merges against a complete
        # store (swap_store keeps one full copy at every crash point)
        recover_store(dim_path)
        dim = spark.read.parquet(dim_path)
        merged = scd2_merge(
            dim,
            latest_per_key(batch, key_col, effective_col),
            key_col,
            attr_cols,
            effective_col=effective_col,
        )
        staging = dim_path.rstrip("/") + f"._staging_{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        swap_store(dim_path, staging)

    writer = update_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
