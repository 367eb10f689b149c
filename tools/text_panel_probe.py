"""1x/10x scale probe for the round-9 batch-2 text/curation panels:

  - subword_fertility_stats: token explode + lang agg — pins linear
    wall-clock (map-side combine leaves a handful of rows per task).
  - ngram_diversity: the distinct-(source, gram) shuffle — copies do
    NOT add distinct grams, so 10x stresses the pre-shuffle combine
    (shuffle volume must stay ~flat while the scan grows 10x).
  - char_entropy_panel: the per-character explode (heaviest stage);
    state is alphabet-sized per doc, so 10x must stay ~linear.
  - source_overlap_matrix: distinct gram->source-set fold + pair
    explode; copies reuse sources, so the pair stage is scale-flat
    and the probe pins the distinct fold's combine.
  - quality_rank_fusion: three GLOBAL rank windows over the projected
    signal frame — the documented single-partition sort; the probe
    measures how far that holds before range-partitioned quantiles
    are required.

    python tools/text_panel_probe.py [copies]
"""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from metrocloud_data_pipeline_spark.llm import curation, dedup, text  # noqa: E402
from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import load  # noqa: E402

SF = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("text_panel_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load(spark, SF, "documents")
    docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs1.select(
                (F.col("doc_id") + OFFSET * i).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            for i in range(copies)
        ],
    ).localCheckpoint()
    n = docs.count()
    print(f"copies={copies} docs={n:,}")

    t0 = time.time()
    rows = text.subword_fertility_stats(docs).collect()
    total_words = sum(r["n_words"] for r in rows)
    print(
        f"subword_fertility {copies}x langs={len(rows)} "
        f"words={total_words:,} {time.time() - t0:6.1f} s"
    )

    t0 = time.time()
    rows = text.ngram_diversity(docs.where(F.length(F.trim('text')) > 0)).collect()
    tot = sum(r["total_grams"] for r in rows)
    dis = sum(r["distinct_grams"] for r in rows)
    print(
        f"ngram_diversity {copies}x rows={len(rows)} total_grams={tot:,} "
        f"distinct={dis:,} {time.time() - t0:6.1f} s"
    )

    t0 = time.time()
    e = (
        text.char_entropy_panel(docs)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars_norm").alias("chars"),
            F.sum(F.col("low_entropy").cast("int")).alias("low"),
        )
        .collect()[0]
    )
    print(
        f"char_entropy {copies}x docs={e['docs']:,} chars={e['chars']:,} "
        f"low={e['low']:,} {time.time() - t0:6.1f} s"
    )

    t0 = time.time()
    m = dedup.source_overlap_matrix(docs).collect()
    shared = sum(r["shared_grams"] for r in m)
    print(
        f"source_overlap {copies}x pairs={len(m)} shared_grams={shared:,} "
        f"{time.time() - t0:6.1f} s"
    )

    t0 = time.time()
    top = curation.quality_rank_fusion(docs, top_n=50).collect()
    print(
        f"quality_rank_fusion {copies}x top={len(top)} "
        f"best={top[0]['doc_id']} {time.time() - t0:6.1f} s"
    )

    spark.stop()


if __name__ == "__main__":
    main()


def batch3(copies: int = 10) -> None:
    """1x/10x probe for zipf / JSD / label purity (run: python -c
    "import tools.text_panel_probe as t; t.batch3(10)")."""
    from metrocloud_data_pipeline_spark.llm import similarity, text as T

    spark = get_spark("text_panel_probe_b3")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load(spark, SF, "documents")
    docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs1.select(
                (F.col("doc_id") + OFFSET * i).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
            for i in range(copies)
        ],
    ).localCheckpoint()
    print(f"copies={copies} docs={docs.count():,}")

    t0 = time.time()
    z = T.zipf_slope_by_source(docs.where(F.length(F.trim("text")) > 0)).collect()
    print(f"zipf_slope {copies}x sources={len(z)} "
          f"slope[0]={z[0]['zipf_slope']} {time.time() - t0:6.1f} s")

    t0 = time.time()
    j = curation.source_js_divergence(docs).collect()
    print(f"js_divergence {copies}x pairs={len(j)} {time.time() - t0:6.1f} s")

    emb1 = load(spark, SF, "embeddings")
    emb = reduce(
        lambda a, b: a.unionByName(b),
        [
            emb1.select((F.col("vec_id") + OFFSET * i).alias("vec_id"), "embedding", "label")
            for i in range(copies)
        ],
    ).localCheckpoint()
    t0 = time.time()
    p = similarity.embed_label_purity(emb).collect()
    print(f"label_purity {copies}x vecs={emb.count():,} labels={len(p)} "
          f"min_purity={min(r['purity'] for r in p)} {time.time() - t0:6.1f} s")
    spark.stop()
