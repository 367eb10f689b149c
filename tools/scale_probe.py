"""10x scale probe: run the heavy operators on an in-memory 10x union
of the sf0.1 tables (id-offset copies, texts perturbed per copy so
copies are near- but not exact dups) and print wall-clock + row counts.

Evidence for the would-this-survive-10x question without writing any
test data: sub-linear wall-clock growth (parallelism absorbs the extra
data) and no candidate-pair explosion beyond the semantically-quadratic
dup clusters the perturbed copies deliberately create.

    python tools/scale_probe.py [copies]
"""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from metrocloud_data_pipeline_spark.llm import curation, dedup, similarity  # noqa: E402
from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import load  # noqa: E402

SF = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = load(spark, SF, "documents")
    docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            docs1.select(
                (F.col("doc_id") + i * OFFSET).alias("doc_id"),
                F.concat(F.lit(f"v{i} "), F.col("text")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 3).alias("n_chars"),
            )
            for i in range(copies)
        ],
    )
    emb1 = load(spark, SF, "embeddings")
    emb = reduce(
        lambda a, b: a.unionByName(b),
        [
            emb1.select((F.col("vec_id") + i * OFFSET).alias("vec_id"), "label", "embedding")
            for i in range(copies)
        ],
    )

    def t(df, label: str) -> None:
        # accepts a thunk so operators that run jobs eagerly during
        # construction (duplicate_clusters' checkpointed rounds) are
        # timed too, not just the final count
        t0 = time.time()
        if callable(df):
            df = df()
        n = df.count()
        print(f"{label:<16} {time.time() - t0:6.2f} s  {n:>10,} rows")

    print(f"--- {copies}x sf0.1: {docs.count():,} docs, {emb.count():,} vectors")
    t(dedup.exact_dedup(docs), "exact_dedup")
    t(dedup.minhash_dedup(docs), "minhash_dedup")
    t(dedup.simhash_dedup(docs), "simhash_dedup")
    t(similarity.ivf_topk(emb, query_vec_id=7, k=10), "ivf_topk")
    bench_docs = docs.where(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    # the filters reference the aggregated column, so Catalyst cannot
    # eliminate the left join under count()
    t(
        curation.contamination_check(docs, bench_docs, n=6).where(
            F.col("contamination_frac") >= 0
        ),
        "contamination",
    )
    t(curation.repetition_stats(docs, n=2).where(F.col("dup_ngram_frac") >= 0), "repetition")
    # capped-bucket candidate path: the clusters stay bounded because the
    # perturbed copies form cliques whose pair lists the cap truncates
    t(
        lambda: dedup.duplicate_clusters(
            dedup.token_jaccard_pairs_lsh(docs, threshold=0.95, max_bucket_size=500).select(
                "doc_a", "doc_b"
            )
        ),
        "dup_clusters",
    )


if __name__ == "__main__":
    main()
