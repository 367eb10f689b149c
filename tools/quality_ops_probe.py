"""1x/10x scale probe for the round-9 quality/dedup additions:

  - dedup_c4_sentence_spans (sentence_span_dedup): 10x id-offset copies
    make EVERY span a cross-copy duplicate — only copy 0 keeps its
    spans, so the probe stresses the worst case where the position
    union covers ~90% of the corpus.
  - boilerplate_line_filter: every line occurs in >= copies docs at
    10x — the rebuild removes nearly everything (worst-case membership
    arrays).
  - minhash_recall_report: the audit's own cost at production banding
    over 10x the corpus (sample stays fixed at 200 docs).
  - gopher_quality_panel / c4_line_filter: map-only passes — the probe
    pins that wall-clock grows ~linearly with rows and nothing spills.

    python tools/quality_ops_probe.py [copies]
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
    spark = get_spark("quality_ops_probe")
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

    # The synthetic corpus is unpunctuated (one giant sentence per doc),
    # which would zero the span stage — stamp a deterministic period
    # after every 8th token so copies share real 3-sentence spans and
    # only copy 0 keeps them (worst-case position-union coverage).
    sent_docs = docs.withColumn(
        "text", F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", r"$1. ")
    )
    t0 = time.time()
    row = (
        text.sentence_span_dedup(sent_docs)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_dup_spans").alias("dup_spans"),
            F.sum("removed_sentences").alias("removed"),
        )
        .collect()[0]
    )
    print(
        f"sentence_span_dedup {copies}x docs={row['docs']:,} "
        f"dup_spans={row['dup_spans']:,} removed={row['removed']:,} "
        f"{time.time() - t0:6.1f} s"
    )

    t0 = time.time()
    row = (
        curation.boilerplate_line_filter(docs)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("removed_lines").alias("removed"),
            F.sum(F.length("clean_text")).alias("clean_chars"),
        )
        .collect()[0]
    )
    print(
        f"boilerplate_line_filter {copies}x docs={row['docs']:,} "
        f"removed_lines={row['removed']:,} clean_chars={row['clean_chars']:,} "
        f"{time.time() - t0:6.1f} s"
    )

    t0 = time.time()
    rep = dedup.minhash_recall_report(docs).collect()
    top = max(rep, key=lambda r: r["bucket_lo"]) if rep else None
    print(
        f"minhash_recall_report {copies}x buckets={len(rep)} "
        f"top_bucket_recall={top['recall'] if top else 'n/a'} "
        f"{time.time() - t0:6.1f} s"
    )

    t0 = time.time()
    g = curation.gopher_quality_panel(docs).agg(
        F.count(F.lit(1)), F.sum(F.col("gopher_pass").cast("int"))
    ).collect()[0]
    print(f"gopher_quality_panel {copies}x docs={g[0]:,} pass={g[1]:,} {time.time() - t0:6.1f} s")

    t0 = time.time()
    c = curation.c4_line_filter(docs).agg(
        F.count(F.lit(1)), F.sum("kept_lines")
    ).collect()[0]
    print(f"c4_line_filter {copies}x docs={c[0]:,} kept_lines={c[1]:,} {time.time() - t0:6.1f} s")

    spark.stop()


if __name__ == "__main__":
    main()
