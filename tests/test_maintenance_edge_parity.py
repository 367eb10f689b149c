"""Pathological fixtures through the maintenance/lifecycle layer
(VERDICT r11 #3) — the fifth edge-parity module, pointed at OP-D1..D5
and the refresh cascade the way the streaming/embeddings/events modules
were pointed at their layers. Three fixture classes, each a state a
real 100 TB store reaches in week one:

- NULL event times (a failed encoder/clock): to_date(NULL) used to
  route rows into reading_date=__HIVE_DEFAULT_PARTITION__, whose
  directory name then crashed EVERY partition-listing maintenance op
  with a bare isoformat ValueError — rows invisible to archive and
  retention forever. write_partitioned now refuses them fail-loud
  JVM-side (no extra scan) and list_partitions explains the repair.
- data-less partition directories (interrupted delete, bare mkdir):
  parquet schema inference cannot see an empty directory, so archive /
  compaction / refresh used to crash with UNABLE_TO_INFER_SCHEMA on a
  directory holding zero rows of data.
- crash-retry states: archive_old_data's append-then-delete sequence
  used to DUPLICATE a partition's rows in the archive when the job
  died between the two ops and retried; the move is now a natural-key
  deduped merge promoted via swap_store, so every crash point leaves
  both stores readable and the retry converges.
"""

from __future__ import annotations

import os
from datetime import date, datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from metrocloud_data_pipeline_spark.operators import maintenance as M

NOW = datetime(2024, 2, 1, 12, 0, 0)

SCHEMA = "device_id string, device_type string, timestamp timestamp, value double"


def _readings(spark, days):
    rows = [
        (f"d{i}", "temp", datetime(2024, 1, day, 6, 0, 0), float(day * 10 + i))
        for day in days
        for i in range(3)
    ]
    return spark.createDataFrame(rows, SCHEMA)


# --- NULL event times -------------------------------------------------------


def test_write_partitioned_refuses_null_event_time(spark, tmp_path):
    """A NULL timestamp has no partition home; writing it would poison
    every later partition listing. The refusal is JVM-side (raise_error
    inside the write pass), so it costs no extra scan."""
    from pyspark.errors import SparkRuntimeException

    path = str(tmp_path / "main")
    bad = spark.createDataFrame(
        [("d1", "temp", datetime(2024, 1, 5, 6), 1.0), ("d2", "temp", None, 2.0)],
        SCHEMA,
    )
    with pytest.raises(SparkRuntimeException, match="no partition home"):
        M.write_partitioned(bad, path)
    # valid rows still write
    M.write_partitioned(bad.where(F.col("timestamp").isNotNull()), path)
    assert M.read_table(spark, path).count() == 1


def test_list_partitions_explains_foreign_null_partition(spark, tmp_path):
    """A store poisoned by some OTHER writer (no guard) must fail with
    the repair instructions, not a bare isoformat ValueError — and the
    same clear failure must surface through archive/retention, which
    would otherwise each make a different partial-view mistake."""
    path = str(tmp_path / "main")
    M.write_partitioned(_readings(spark, [5]), path)
    os.makedirs(f"{path}/reading_date=__HIVE_DEFAULT_PARTITION__")
    with pytest.raises(ValueError, match="non-date partition"):
        M.list_partitions(path)
    with pytest.raises(ValueError, match="repair the store"):
        M.archive_old_data(spark, path, str(tmp_path / "arch"), 10, now=NOW)
    with pytest.raises(ValueError, match="repair the store"):
        M.cleanup_archive(path, 10, now=NOW)


def test_list_partitions_skips_swap_artifacts(spark, tmp_path):
    """Stranded swap/compaction artifacts (partition._old, ._compact_tmp,
    ._archive_tmp) are KNOWN transients that recover_store /
    vacuum_store_artifacts repair — the listing must skip them so the
    repairing retry can actually run, not die on them."""
    path = str(tmp_path / "main")
    M.write_partitioned(_readings(spark, [5, 6]), path)
    for suffix in ("._old", "._compact_tmp", "._archive_tmp"):
        os.makedirs(f"{path}/reading_date=2024-01-05{suffix}")
    assert sorted(d.day for d in M.list_partitions(path)) == [5, 6]


# --- data-less partition directories ----------------------------------------


def test_archive_clears_empty_partition_dir_without_reading(spark, tmp_path):
    main, arch = str(tmp_path / "main"), str(tmp_path / "arch")
    M.write_partitioned(_readings(spark, [5, 30]), main)
    os.makedirs(f"{main}/reading_date=2024-01-01")          # bare remnant
    moved = M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW)
    assert moved == 3                                        # day 5 only
    assert [d.day for d in M.list_partitions(main)] == [30]
    assert not os.path.exists(f"{main}/reading_date=2024-01-01")
    assert [d.day for d in M.list_partitions(arch)] == [5]


def test_compact_partitions_skips_empty_partition_dir(spark, tmp_path):
    path = str(tmp_path / "main")
    M.write_partitioned(_readings(spark, [1]).repartition(4), path)
    os.makedirs(f"{path}/reading_date=2024-01-02")
    n = M.compact_partitions(spark, path, older_than_days=7, now=NOW)
    assert n == 1                                            # only the real one
    assert M.read_table(spark, path).count() == 3


def test_compact_append_store_tolerates_missing_and_empty_store(spark, tmp_path):
    """A maintenance schedule firing before the first batch ever
    appended (a rejects sink that never rejected) is a no-op, not an
    UNABLE_TO_INFER_SCHEMA crash."""
    missing = str(tmp_path / "never_written")
    assert M.compact_append_store(spark, missing) == 0
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    assert M.compact_append_store(spark, empty) == 0
    # and a real store still compacts
    store = str(tmp_path / "store")
    _readings(spark, [1, 2]).repartition(6).write.parquet(store)
    n_before = len(spark.read.parquet(store).inputFiles())
    assert M.compact_append_store(spark, store, target_partitions=2) == n_before
    assert spark.read.parquet(store).count() == 6
    assert len(spark.read.parquet(store).inputFiles()) <= 2


def test_refresh_rollup_cascade_clears_day_left_as_empty_dir(spark, tmp_path):
    """Retention that emptied a partition's FILES but left its directory
    must behave exactly like a dropped partition: both cascade levels
    cleared for that day, everything else untouched."""
    import shutil

    raw, hourly, daily = (
        str(tmp_path / "raw"), str(tmp_path / "hourly"), str(tmp_path / "daily")
    )
    rows = [
        ("d1", "temperature_sensor", datetime(2024, 1, d, h, 0, 0), 20.0 + h, False)
        for d in (1, 2)
        for h in (0, 6)
    ]
    df = spark.createDataFrame(
        rows,
        "device_id string, device_type string, timestamp timestamp, "
        "value double, is_anomaly boolean",
    )
    M.write_partitioned(df, raw)
    assert M.refresh_rollup_cascade(spark, raw, hourly, daily) == 2
    assert sorted(d.day for d in M.list_partitions(daily)) == [1, 2]

    # empty day 1's directory the pathological way: delete files only
    part = f"{raw}/reading_date=2024-01-01"
    for name in os.listdir(part):
        os.remove(os.path.join(part, name))
    assert M.refresh_rollup_cascade(
        spark, raw, hourly, daily, days=[date(2024, 1, 1)]
    ) == 1
    assert [d.day for d in M.list_partitions(hourly)] == [2]
    assert [d.day for d in M.list_partitions(daily)] == [2]
    # day 2's aggregates survive untouched
    assert M.read_table(spark, daily).where(F.col("reading_count") > 0).count() > 0

    # and the fully-empty raw store clears the remaining day without a
    # schema-inference crash
    shutil.rmtree(f"{raw}/reading_date=2024-01-02")
    os.makedirs(f"{raw}/reading_date=2024-01-02")
    assert M.refresh_rollup_cascade(
        spark, raw, hourly, daily, days=[date(2024, 1, 2)]
    ) == 1
    assert M.list_partitions(hourly) == []
    assert M.list_partitions(daily) == []


# --- crash-retry states ------------------------------------------------------


def test_archive_retry_after_crash_between_write_and_delete(spark, tmp_path):
    """The r12 fixture sweep's real find: append-then-delete duplicated
    every row of the partition in the archive when the job died between
    the two ops and retried. The merge+swap form converges: re-running
    the move with the archive already holding the rows leaves exactly
    one copy."""
    main, arch = str(tmp_path / "main"), str(tmp_path / "arch")
    batch = _readings(spark, [5])
    M.write_partitioned(batch, main)
    assert M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW) == 3
    assert M.read_table(spark, arch).count() == 3

    # simulate the crash-before-delete state: the main partition is back
    # (never deleted) while the archive already holds the rows
    M.write_partitioned(batch, main)
    assert M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW) == 3
    assert M.read_table(spark, arch).count() == 3            # NOT 6
    assert M.list_partitions(main) == []


def test_archive_merges_late_data_for_already_archived_day(spark, tmp_path):
    """Late rows landing in main for a day that was already archived
    must ADD to the archive partition (dedup is by natural key, so
    genuinely new readings survive the merge)."""
    main, arch = str(tmp_path / "main"), str(tmp_path / "arch")
    M.write_partitioned(_readings(spark, [5]), main)
    M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW)

    late = spark.createDataFrame(
        [("d9", "temp", datetime(2024, 1, 5, 23, 0, 0), 99.0)], SCHEMA
    )
    M.write_partitioned(late, main)
    assert M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW) == 1
    got = M.read_table(spark, arch)
    assert got.count() == 4
    assert got.where(F.col("device_id") == "d9").count() == 1


def test_archive_interrupted_swap_is_recoverable(spark, tmp_path):
    """If the crash lands INSIDE the archive partition's swap (aside
    renamed, promote not yet done), recover_store restores the aside
    copy and the retry converges — no state loses the archived rows."""
    main, arch = str(tmp_path / "main"), str(tmp_path / "arch")
    M.write_partitioned(_readings(spark, [5]), main)
    M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW)
    part = f"{arch}/reading_date=2024-01-05"

    # simulate the aside-but-not-promoted crash state
    M._fs_rename(part, part + "._old")
    assert not os.path.exists(part)
    assert M.recover_store(part) is True
    assert spark.read.parquet(part).count() == 3

    # a retry against the recovered store is a clean no-op
    assert M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW) == 0
    assert M.read_table(spark, arch).count() == 3


def test_archive_converges_natural_key_duplicates_on_retry(spark, tmp_path):
    """A partition carrying natural-key duplicates (written around
    idempotent_append by a raw writer) keeps them on a clean first move
    — archive is a faithful move, not a cleaner — but a crash-retry
    merge converges to natural-key-unique rows, the same identity
    contract idempotent_append enforces on the way in."""
    main, arch = str(tmp_path / "main"), str(tmp_path / "arch")
    batch = _readings(spark, [5])
    M.write_partitioned(batch.union(batch), main)
    assert M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW) == 6
    assert M.read_table(spark, arch).count() == 6            # faithful move

    M.write_partitioned(batch.union(batch), main)            # crash-retry state
    M.archive_old_data(spark, main, arch, older_than_days=10, now=NOW)
    assert M.read_table(spark, arch).count() == 3            # converged
