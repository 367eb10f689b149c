"""Media ingest-stream near-dup gate probe (r15).

Measures what the arrival-time near-dup screen COSTS and what it
CATCHES at two corpus scales, with the planted-copy construction the
recall-audit keys pin:

- batch 1: N tone-sequence audio items (synth_tone_sequence_corpus —
  real PCM, 4 concatenated sine segments, band walk over 32 mel
  bands) + N/5 constant-gray AVI videos (synth_video_corpus);
- batch 2: 24-bit re-encodes of 10% of batch 1's audio
  (media_reencoded_copies — byte-different, signal-identical) +
  rec-LIST re-containers of 10% of batch 1's video
  (media_recontainered_copies — byte-different, frame-identical) +
  fresh items on disjoint doc_ids.

The stream runs twice per scale (near_dup_screen off / on; both with
the exact tier on), and the probe reports per-batch wall from the
metrics table, keep/near-dup splits, and PLANTED-COPY RECALL at the
gate: every planted copy must reject as near_duplicate_in_store (the
exact tier can never catch them — byte-different by construction).
Fresh-item rejections are reported honestly: the 32-band print space
is the documented oracle-anchor degeneracy (two fresh 4-band
sequences can collide wholesale), so a nonzero count here is the
fixture's property, not a gate bug.

    python tools/media_stream_probe.py [N] [N_10x]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from metrocloud_data_pipeline_spark.llm.multimodal import (  # noqa: E402
    media_recontainered_copies,
    media_reencoded_copies,
    synth_tone_sequence_corpus,
    synth_video_corpus,
)
from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import load  # noqa: E402
from metrocloud_data_pipeline_spark.streaming.media import (  # noqa: E402
    run_media_feature_stream,
)

SF = "/root/testdata/sf0.1"
COPY_OFFSET = 50_000_000


def build_source(spark, root: Path, n_audio: int) -> tuple[set[int], int]:
    """Write batch dirs a/ (originals) and b/ (planted copies + fresh);
    return (planted copy ids, total batch-2 rows)."""
    n_video = max(1, n_audio // 5)
    docs = load(spark, SF, "documents").select("doc_id")
    base_a = docs.orderBy("doc_id").limit(n_audio)
    # video ids live in a disjoint range (audio and video items must
    # not share media_ids, or their print sets would merge per id)
    base_v = (
        docs.orderBy("doc_id").limit(n_video)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"))
    )
    audio1 = synth_tone_sequence_corpus(base_a)
    video1 = synth_video_corpus(base_v)
    b1 = audio1.unionByName(video1, allowMissingColumns=True)
    b1.coalesce(8).write.mode("overwrite").parquet(str(root / "a"))

    # planted copies of the first decile of each tier (by actual ids)
    thr_a = max(r.doc_id for r in base_a.limit(max(1, n_audio // 10)).collect())
    thr_v = max(r.doc_id for r in base_v.limit(max(1, n_video // 10)).collect())
    plant_a = media_reencoded_copies(
        audio1.where(F.col("media_id") <= F.lit(thr_a)),
        id_offset=COPY_OFFSET,
    )
    plant_v = media_recontainered_copies(
        video1.where(F.col("media_id") <= F.lit(thr_v)),
        id_offset=COPY_OFFSET,
    )
    fresh_ids = (
        docs.orderBy(F.col("doc_id").desc()).limit(max(1, n_audio // 10))
        .select((F.col("doc_id") + 2 * COPY_OFFSET).alias("doc_id"))
    )
    # a different band walk (step 29 vs 37) so fresh sequences neither
    # byte-match nor wholesale print-match the stored walk — the 32-band
    # print space is period-32 in doc_id, so same-step fresh items would
    # mostly be true byte duplicates of stored ones
    fresh = synth_tone_sequence_corpus(fresh_ids, band_step=29)
    b2 = plant_a.unionByName(plant_v, allowMissingColumns=True).unionByName(
        fresh, allowMissingColumns=True
    )
    b2.coalesce(8).write.mode("overwrite").parquet(str(root / "b"))
    planted = {
        r.media_id
        for r in plant_a.select("media_id").unionByName(
            plant_v.select("media_id")
        ).collect()
    }
    n_b2 = b2.count()
    return planted, n_b2


def run_once(spark, src: Path, work: Path, screen: bool) -> dict:
    out = str(work / "features")
    rejects = str(work / "rejects")
    metrics = str(work / "metrics")
    t0 = time.monotonic()
    q = run_media_feature_stream(
        spark, str(src) + "/*", out, str(work / "ck"),
        rejects_path=rejects, metrics_path=metrics,
        decode_stub=False, dim=8, max_files_per_trigger=1, dedup=True,
        near_dup_screen=screen,
        print_index_path=(str(work / "print_index") if screen else None),
    )
    q.awaitTermination(600)
    assert q.exception() is None, q.exception()
    wall = time.monotonic() - t0
    ms = {r.batch_id: r for r in spark.read.parquet(metrics).collect()}
    rej = (
        {
            r.media_id
            for r in spark.read.parquet(rejects).collect()
            if r.reason == "near_duplicate_in_store"
        }
        if screen
        else set()
    )
    kept_ids = {
        r.media_id
        for r in spark.read.parquet(out).select("media_id").collect()
    }
    return {"wall": wall, "metrics": ms, "near_rejects": rej, "kept": kept_ids}


def main() -> None:
    n_1x = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    n_10x = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
    spark = get_spark("media_stream_probe")
    spark.sparkContext.setLogLevel("ERROR")

    for label, n in (("1x", n_1x), ("10x", n_10x)):
        tmp = Path(tempfile.mkdtemp(prefix=f"media_probe_{label}_"))
        try:
            src = tmp / "uploads"
            src.mkdir()
            planted, n_b2 = build_source(spark, src, n)
            print(f"\n=== {label}: {n} audio + {n // 5} video originals; "
                  f"batch2 {n_b2} rows ({len(planted)} planted copies) ===")
            for screen in (False, True):
                work = tmp / ("on" if screen else "off")
                work.mkdir()
                r = run_once(spark, src, work, screen)
                walls = {b: m.wall_ms for b, m in r["metrics"].items()}
                near = {b: getattr(m, "n_near_dup", 0) for b, m in r["metrics"].items()}
                kept = {b: m.n_features for b, m in r["metrics"].items()}
                exact = {b: m.n_duplicates for b, m in r["metrics"].items()}
                print(f"screen={'on ' if screen else 'off'} total {r['wall']:6.1f} s  "
                      f"batch wall_ms {walls}  kept {kept}  exact_dup {exact}  "
                      f"near_dup {near}")
                if screen:
                    # the metric that matters: NO planted content may
                    # reach the store. A planted copy can be suppressed
                    # either by the near-dup screen directly or by
                    # exact-dup-matching ANOTHER planted copy whose
                    # digest keeper the screen rejected (the period-32
                    # payload degeneracy makes the plant set itself
                    # carry byte twins at this scale) — both are
                    # correct suppression.
                    leaked = planted & r["kept"]
                    extra = r["near_rejects"] - planted
                    print(f"           planted suppressed "
                          f"{len(planted) - len(leaked)}/{len(planted)} "
                          f"({len(r['near_rejects'] & planted)} by the "
                          f"screen, rest exact-dup twins of screened "
                          f"keepers); leaked {len(leaked)}; fresh-item "
                          f"rejections {len(extra)}")
                    assert not leaked, f"planted copies LEAKED: {sorted(leaked)[:5]}"
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
