"""Cross-engine edge parity for the EMBEDDINGS-table queries — the
documents twin is tests/test_oracle_edge_parity.py; this module pins
the oracle-backed embedding queries on a PATHOLOGICAL embeddings table
(zero vector, duplicate vectors, negative components, a single-member
label, antipodal pairs) instead of the well-behaved driver fixtures.

The driver regenerates embeddings.parquet every round; zero vectors in
particular exercise every cosine's divide-by-zero guard on BOTH
engines at once — a drift here would otherwise surface as a red
CORRECTNESS row mid-round.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from metrocloud_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES

EMB_QUERIES = [
    "embed_dedup_keep_list",
    "dedup_embed_cosine",
    "embed_quantize_stats",
    "embedding_label_stats",
    "knn_brute_force",
    "knn_join_brute",
    "knn_filtered_brute",
    "embed_label_purity",
    "embed_centroid_drift",
    # r12 completeness sweep: found absent by the registry scan
    "decontaminate_embed",
]

EDGE_ROWS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [1.0, 0.0, 0.0, 0.0], 0),      # exact duplicate of 0
    (2, [0.0, 0.0, 0.0, 0.0], 0),      # ZERO vector: cosine guard
    (3, [-1.0, 0.0, 0.0, 0.0], 1),     # antipodal to 0
    (4, [0.5, 0.5, 0.5, 0.5], 1),
    (5, [1e-8, 0.0, 0.0, 0.0], 0),     # near-zero norm
    (6, [3.0, -4.0, 0.0, 0.0], 2),     # single-member label
    (7, [0.0, 1.0, 0.0, 0.0], 1),
    (8, [0.70710678, 0.70710678, 0.0, 0.0], 0),
    (9, [-0.5, -0.5, -0.5, -0.5], 1),  # antipodal to 4
]


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("emb_edge")
    spark.createDataFrame(
        EDGE_ROWS, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def _canon(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    d = d.sort_values(by=cols).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embedding_edge_parity(spark, emb_dir, name):
    got = SPARK_QUERIES[name](spark, emb_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{emb_dir}/embeddings.parquet/*.parquet'"
    )
    want = con.execute(ORACLE_SQL[name]).df()
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    assert _canon(got) == _canon(want), (
        got.sort_values(by=sorted(got.columns)).head(20),
        want.sort_values(by=sorted(want.columns)).head(20),
    )


def test_cosine_batch_zero_norm_reaches_spark_as_null(spark):
    """cosine_batch's zero-norm guard returns pd.NA in a pandas
    nullable Float64 series; this pins that the Arrow pandas-UDF
    serializer on the CURRENT pandas/pyarrow pins delivers it to Spark
    as SQL NULL, not NaN. The distinction is load-bearing: Spark ranks
    NaN GREATEST in a descending top-k, so a silent NA->NaN coercion
    (the behavior of older pins) would re-promote zero-norm junk
    vectors to the top of every similarity ranking."""
    import pyspark.sql.functions as F

    from metrocloud_data_pipeline_spark.llm.similarity import cosine_batch

    df = spark.createDataFrame(
        [
            ([0.0, 0.0], [1.0, 0.0]),   # zero-norm left side -> NULL
            ([1.0, 0.0], [1.0, 0.0]),   # well-formed -> 1.0
        ],
        "a array<float>, b array<float>",
    )
    cos = cosine_batch()
    rows = (
        df.select(cos(F.col("a"), F.col("b")).alias("c"))
        .select(
            F.col("c"),
            F.isnull("c").alias("is_null"),
            F.isnan(F.coalesce(F.col("c"), F.lit(0.0))).alias("is_nan"),
        )
        .collect()
    )
    by_val = {r["is_null"]: r for r in rows}
    assert True in by_val and by_val[True]["is_nan"] is False, rows
    assert False in by_val and abs(by_val[False]["c"] - 1.0) < 1e-9, rows
