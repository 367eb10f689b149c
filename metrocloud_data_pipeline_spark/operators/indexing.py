"""Metadata inverted index — the GIN-index analogue for map/JSON
predicates (reference: database/init.sql:126-127 creates GIN indexes on
device_metadata/tags so JSONB containment queries don't scan).

A parquet engine has no GIN; the honest equivalent at 100 TB is an
inverted SIDE TABLE maintained at ingest (the same pattern as the
MinHash band index): every (key, value) pair of the metadata map
becomes one narrow row (meta_key, meta_value, meta_value_num,
reading_id), written range-partitioned and sorted by
(meta_key, meta_value_num) so a lookup's file-level min/max stats prune
to the few files covering the predicate range. A metadata lookup then
(1) scans the NARROW pruned index — no JSON parsing over the corpus,
no full-width row reads — and (2) joins the matching reading_ids back
to the main table (keyed join; with the main table bucketed on
reading_id, exchange-free on the corpus side).

f6_metadata_lookup remains the direct-scan form (fine when the
predicate is rare or ad hoc); this is the repeated-lookup path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metadata_index_frame(readings: DataFrame, props_col: str = "props") -> DataFrame:
    """Explode the JSON metadata column into inverted rows. String
    values keep their text form; numeric values additionally populate
    meta_value_num so range predicates compare numerically (and sort
    numerically for min/max pruning)."""
    parsed = readings.select(
        "reading_id",
        F.explode(
            F.from_json(F.col(props_col), "map<string,string>")
        ).alias("meta_key", "meta_value"),
    )
    return parsed.withColumn(
        "meta_value_num", F.col("meta_value").try_cast("double")  # non-numeric -> NULL (ANSI-safe)
    )


def build_metadata_index(
    readings: DataFrame,
    index_path: str,
    props_col: str = "props",
    n_files: int = 8,
) -> None:
    """Materialize the inverted index range-partitioned + sorted by
    (meta_key, meta_value_num): one exchange that doubles as the file
    layout, so every file covers a contiguous (key, value) slab and
    parquet min/max footer stats answer 'can this file match the
    predicate?' — the GIN page-skip, as plain sorted parquet. Rebuild
    per partition/day alongside compaction, or append per ingest batch
    and compact (same lifecycle as the band index)."""
    (
        metadata_index_frame(readings, props_col)
        .repartitionByRange(n_files, "meta_key", "meta_value_num")
        .sortWithinPartitions("meta_key", "meta_value_num")
        .write.mode("overwrite")
        .parquet(index_path)
    )


def tags_index_frame(readings: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Explode the tags array into inverted (tag, reading_id) rows —
    the GIN analogue for the reference's TEXT[] tags column
    (init.sql:127 GIN-indexes tags next to device_metadata; avsc
    :145-151 declares the array). One narrow row per array element, the
    same maintained-at-ingest side-table pattern as the metadata
    index."""
    return readings.select(
        "reading_id", F.explode(F.col(tags_col)).alias("tag")
    )


def build_tags_index(
    readings: DataFrame,
    index_path: str,
    tags_col: str = "tags",
    n_files: int = 8,
) -> None:
    """Materialize the tags inverted index range-partitioned + sorted
    by tag: every file covers a contiguous tag slab, so an
    array_contains lookup prunes to the files whose min/max footer
    stats admit the tag — the GIN page-skip as plain sorted parquet
    (same lifecycle as the metadata/band indexes: rebuild with
    compaction or append per ingest batch)."""
    (
        tags_index_frame(readings, tags_col)
        .repartitionByRange(n_files, "tag")
        .sortWithinPartitions("tag")
        .write.mode("overwrite")
        .parquet(index_path)
    )


def tags_lookup_indexed(
    readings: DataFrame,
    index: DataFrame,
    tag: str,
) -> DataFrame:
    """array_contains(tags, tag) through the inverted index: the
    equality predicate evaluates on the narrow (pruned) index scan —
    the corpus's array column is never read — and only matching
    reading_ids join back for the row payload. The join is LEFT SEMI
    (membership, not multiplication): a reading whose array repeats a
    tag has several index rows for it, and an inner join would emit
    the reading once per occurrence where array_contains emits it
    once. Returns (reading_id, device_id), the same rows as the
    direct array_contains scan."""
    hits = index.where(F.col("tag") == tag).select("reading_id")
    return readings.select("reading_id", "device_id").join(
        hits, "reading_id", "left_semi"
    )


def metadata_lookup_indexed(
    readings: DataFrame,
    index: DataFrame,
    key: str,
    min_value: int,
) -> DataFrame:
    """f6_metadata_lookup through the inverted index: the predicate
    evaluates on the narrow (pruned) index scan and only matching
    reading_ids join back for the row payload. Output schema matches
    metadata_lookup exactly (reading_id, device_id, meta_value)."""
    hits = index.where(
        (F.col("meta_key") == key) & (F.col("meta_value_num") >= min_value)
    ).select(
        "reading_id", F.col("meta_value_num").cast("int").alias("meta_value")
    )
    return readings.select("reading_id", "device_id").join(hits, "reading_id")
