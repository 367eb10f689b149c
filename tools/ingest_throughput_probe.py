"""Ingest-throughput probe: the full streaming ingest path (normalize +
validate + fan-out + idempotent date-partitioned append + per-batch
metrics) measured end-to-end, against the reference's configured
operating envelope of 8 msg/s (BASELINE.md: 8 devices x 1 Hz,
config.yaml:130-131).

Generates N raw RuuviTag-shaped messages, streams them through
run_ingest_stream with availableNow, and reports messages/sec and
fanned-out readings/sec. Single local[32] node — a cluster multiplies
this by executors, the reference's single consumer does not.

    python tools/ingest_throughput_probe.py [n_messages]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.streaming import pipeline  # noqa: E402


def raw_messages(spark, n: int):
    """n raw wide messages in the RAW_RUUVITAG_SCHEMA shape: 64 devices,
    1 Hz ticks, all 9 channels populated, deterministic values."""
    base = 1_758_870_000
    df = spark.range(n)
    h = F.abs(F.xxhash64("id"))
    val = (h % 1000).cast("double") / 10.0
    return df.select(
        F.format_string(
            "aa:bb:cc:%02x:%02x:%02x",
            (F.col("id") % 64).cast("int"),
            ((F.col("id") / 64) % 256).cast("int"),
            ((F.col("id") / 16384) % 256).cast("int"),
        ).alias("device_id"),
        F.lit("ruuvitag").alias("device_type"),
        (F.col("id") / 64 + base).cast("long").cast("string").alias("timestamp"),
        (val % 50 - 10).alias("temperature"),
        (val % 85 + 15).alias("humidity"),
        (val * 100 + 90000).alias("pressure"),
        (val / 100).alias("acceleration_x"),
        (val / 90).alias("acceleration_y"),
        (val / 80 + 0.9).alias("acceleration_z"),
        (val % 1.3 + 1.8).alias("battery_voltage"),
        F.lit(4.0).alias("tx_power"),
        (val % 100).alias("movement_counter"),
        val.alias("measurement_sequence"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("ingest_probe")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as td:
        src = f"{td}/raw"
        raw_messages(spark, n).repartition(8).write.parquet(src)
        table, ck = f"{td}/table", f"{td}/ck"
        t0 = time.perf_counter()
        q = pipeline.run_ingest_stream(
            pipeline.stream_raw_files(spark, src),
            table,
            ck,
            rejects_path=f"{td}/rejects",
            metrics_path=f"{td}/metrics",
            anchor="2025-09-26 12:00:00",
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        out_rows = spark.read.parquet(table).count()
        print(
            f"ingest_throughput  {n:,} raw msgs -> {out_rows:,} readings in {dt:.1f} s"
            f"  = {n / dt:,.0f} msg/s ({out_rows / dt:,.0f} readings/s)"
            f"  vs reference envelope 8 msg/s: {n / dt / 8:,.0f}x"
        )


if __name__ == "__main__":
    main()
