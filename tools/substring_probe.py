"""r9 probe: substring_dup_spans (Lee et al. 2022 ExactSubstr excise
ranges) at the PAPER's L=50 over planted long duplicates, 1x vs 10x.

The claim under test is the operator's scale shape: every stage is
linear in the corpus GRAM count (grams = sum(max(n_tokens - L + 1, 0)))
— gram assembly is a narrow codegen projection, dup-marking is one
map-side-combined count + a semi-join, the interval union is one
per-doc window. No pair blowup exists anywhere, so 10x data should
cost ~10x grams and wall-clock in the same ballpark (parallelism
absorbs some of it on local[32]).

Fixture: the sf0.1 documents table; 1-in-50 docs get an 80-token
boilerplate passage appended (the planted long duplicate — at L=50 it
excises as one span per planted doc), and the 10x corpus is id-offset
copies with a per-copy UNIQUE 60-token prefix: the prefixes cannot
cross-match, while each copy's body repeats 10x corpus-wide — the
worst-case dense-duplication regime for the excise path.

    python tools/substring_probe.py [copies]
"""

from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from metrocloud_data_pipeline_spark.llm import text as llm_text  # noqa: E402
from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import load  # noqa: E402

SF = "/root/testdata/sf0.1"
OFFSET = 10_000_000
L = 50
BOILER = " ".join(f"boiler{i}" for i in range(80))


def corpus(spark, copies: int):
    docs1 = load(spark, SF, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 50 == 0, F.concat_ws(" ", "text", F.lit(BOILER)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    if copies == 1:
        return docs1
    return reduce(
        lambda a, b: a.unionByName(b),
        [
            docs1.select(
                (F.col("doc_id") + i * OFFSET).alias("doc_id"),
                # 60 unique prefix tokens per copy: no L=50 gram can
                # span copy prefixes, bodies stay exact 10x dups
                F.concat_ws(
                    " ", F.lit(" ".join(f"c{i}p{j}" for j in range(60))), "text"
                ).alias("text"),
            )
            for i in range(copies)
        ],
    )


def one_scale(spark, copies: int) -> None:
    docs = corpus(spark, copies).localCheckpoint()
    n_docs = docs.count()
    grams = docs.select(
        F.greatest(
            F.size(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "))
            - (L - 1),
            F.lit(0),
        ).alias("g")
    ).agg(F.sum("g")).first()[0]
    t0 = time.time()
    spans = llm_text.substring_dup_spans(docs, min_tokens=L)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs_excised"),
        F.sum("n_tokens").alias("tokens_excised"),
    ).first()
    dt = time.time() - t0
    print(
        f"substring_spans  {copies:>2}x  docs={n_docs:>7,}  grams={grams:>12,}  "
        f"spans={agg['n_spans']:>8,}  docs_excised={agg['n_docs_excised']:>7,}  "
        f"tokens_excised={agg['tokens_excised']:>12,}  {dt:6.1f} s"
    )
    # the APPLY side: full cleaned-corpus rebuild (per-token filter
    # against each doc's own span list) — shares the span stages above,
    # so the delta is the rebuild cost alone
    t0 = time.time()
    cleaned = llm_text.excise_dup_spans(docs, min_tokens=L)
    cagg = cleaned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_removed").alias("removed"),
        F.sum(F.length("clean_text")).alias("clean_chars"),
    ).first()
    dt = time.time() - t0
    assert cagg["n_docs"] == n_docs  # every doc returns exactly once
    assert cagg["removed"] == agg["tokens_excised"]
    print(
        f"substring_excise {copies:>2}x  docs={cagg['n_docs']:>7,}  "
        f"removed={cagg['removed']:>12,}  clean_chars={cagg['clean_chars']:>13,}  "
        f"{dt:6.1f} s"
    )
    if copies == 1:
        # every planted doc must excise (the corpus also contains
        # NATURAL >=50-token duplicated passages — measured 353 excised
        # docs vs 100 planted at sf0.1 — which is the operator finding
        # real template boilerplate, not an error)
        planted = set(
            r[0] for r in docs.where(F.col("doc_id") % 50 == 0)
            .select("doc_id").collect()
        )
        excised = set(
            r[0] for r in spans.select("doc_id").distinct().collect()
        )
        missing = planted - excised
        assert not missing, f"planted docs not excised: {sorted(missing)[:5]}"


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("substring_probe")
    spark.sparkContext.setLogLevel("ERROR")
    one_scale(spark, 1)
    one_scale(spark, copies)


if __name__ == "__main__":
    main()
