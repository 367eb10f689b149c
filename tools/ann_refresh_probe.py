"""Round-6/7 probes: (a) IVF recall at a realistic operating point —
including the r7 DEFAULT path (auto-trained coarse quantizer) — and
(b) incremental continuous-aggregate refresh scan pruning, extended in
r7 to the hierarchical cascade (refresh_rollup_cascade).

(a) The r5 recall numbers were measured on uniform random vectors — a
documented degeneracy (every list looks alike, nprobe tells you
nothing). This probe plants REAL cluster structure: k Gaussian clusters
on the unit sphere (centers ~N(0,I) normalized, members = center +
noise, re-normalized), ids interleaved (vec i -> cluster i % k) so the
stride-sampled IVF codebook hits every cluster. Reports
knn_recall_report recall@10 at 1x (10k vecs) and 10x (100k) for a
sweep of nprobe — the number an ANN serving tier would publish.

(b) refresh_bucket_aggregate claims cost proportional to the dirty
partitions, not table size. Evidence: build a 10x date-partitioned
readings store, refresh ONE day, and report the files/bytes the pruned
source scan touches vs the table total, plus wall-clock vs a full
refresh.

    python tools/ann_refresh_probe.py [--fast]
"""

from __future__ import annotations

import sys
import time
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from metrocloud_data_pipeline_spark.llm import similarity  # noqa: E402
from metrocloud_data_pipeline_spark.operators import maintenance as M  # noqa: E402
from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import load  # noqa: E402

SF = "/root/testdata/sf0.1"
DIM = 32
K_CLUSTERS = 32


def planted_embeddings(spark, n: int, noise: float = 0.3, seed: int = 0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((K_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % K_CLUSTERS  # interleaved -> stride seeds hit all
    # noise scaled so the TOTAL perturbation norm is ~`noise` (per-axis
    # noise/sqrt(dim)): random 32-dim unit centers sit ~sqrt(2) apart,
    # so 0.3 gives well-separated but non-degenerate clusters — the
    # realistic regime the r5 uniform vectors failed to represent
    vecs = centers[labels] + (noise / np.sqrt(DIM)) * rng.standard_normal((n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [
        (int(i), int(labels[i]), [float(x) for x in vecs[i]]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def _one_recall(spark, emb, n, label, **kw) -> None:
    t0 = time.perf_counter()
    rep = similarity.knn_recall_report(emb, k=10, max_queries=200, **kw).agg(
        F.round(F.avg("recall"), 4).alias("avg"),
        F.round(F.min("recall"), 4).alias("min"),
        F.count(F.lit(1)).alias("n_q"),
    ).first()
    dt = time.perf_counter() - t0
    print(
        f"ivf_recall  n={n:>7,}  {label:<34}  recall@10 "
        f"avg={rep['avg']:.4f} min={rep['min']:.4f}  "
        f"({rep['n_q']} queries, {dt:5.1f} s)"
    )


def recall_sweep(spark, fast: bool) -> None:
    scales = [1] if fast else [1, 10]
    for scale in scales:
        n = 10_000 * scale
        emb = planted_embeddings(spark, n).cache()
        emb.count()
        # training-free stride quantizer, default stride: over-segments
        # each natural cluster into ~n/(31*K) near-identical lists
        for nprobe in (4, 8):
            _one_recall(
                spark, emb, n,
                f"stride=31 ({n // 31 + 1} lists) nprobe={nprobe}",
                nprobe=nprobe, stride=31, quantizer="stride",
            )
        # stride sized to the natural cluster count
        s = n // K_CLUSTERS
        for nprobe in (1, 4):
            _one_recall(
                spark, emb, n,
                f"stride={s} ({n // s + 1} lists) nprobe={nprobe}",
                nprobe=nprobe, stride=s, quantizer="stride",
            )
        # k-means-trained codebook at the cluster count (the FAISS
        # train step; corpus-shuffle-free mapInPandas partial sums)
        t0 = time.perf_counter()
        cb = similarity.trained_codebook(emb, k=K_CLUSTERS, n_iter=4)
        train_s = time.perf_counter() - t0
        for nprobe in (1, 4):
            _one_recall(
                spark, emb, n,
                f"trained k={K_CLUSTERS} (fit {train_s:.1f} s) nprobe={nprobe}",
                nprobe=nprobe, codebook=cb,
            )
        # the r7 DEFAULT path: no codebook, no quantizer argument —
        # knn_join_ivf auto-trains (k auto-sized by corpus count,
        # capped at DEFAULT_TRAIN_K). This is what a caller who
        # configures nothing gets; the r6 default (stride) measured
        # 0.41 avg here. Gate: >= 0.9 at both scales.
        t0 = time.perf_counter()
        rep = similarity.knn_recall_report(emb, k=10, nprobe=4, max_queries=200).agg(
            F.round(F.avg("recall"), 4).alias("avg"),
            F.round(F.min("recall"), 4).alias("min"),
        ).first()
        dt = time.perf_counter() - t0
        auto_k = similarity._auto_train_k(emb)
        print(
            f"ivf_recall  n={n:>7,}  {'DEFAULT (auto-trained k=%d) nprobe=4' % auto_k:<34}  recall@10 "
            f"avg={rep['avg']:.4f} min={rep['min']:.4f}  (200 queries, {dt:5.1f} s)"
        )
        assert rep["avg"] >= 0.9, f"default ANN path recall {rep['avg']} < 0.9 at n={n}"
        emb.unpersist()


def refresh_pruning(spark, tmp: Path, copies: int = 10) -> None:
    ev = load(spark, SF, "events").select(
        F.col("event_id").alias("reading_id"),
        F.col("user_id").cast("string").alias("device_id"),
        F.col("event_type").alias("device_type"),
        F.col("ts").alias("timestamp"),
        F.col("value"),
        (F.col("value") > 150.0).alias("is_anomaly"),
    )
    big = ev
    for i in range(1, copies):
        big = big.unionByName(
            ev.withColumn("reading_id", F.col("reading_id") + i * 10_000_000)
        )
    store = str(tmp / "readings_part")
    agg = str(tmp / "agg_part")
    M.write_partitioned(big, store, mode="overwrite")

    t0 = time.perf_counter()
    n_full = M.refresh_bucket_aggregate(spark, store, agg, bucket="1 hour")
    full_s = time.perf_counter() - t0

    dirty = [date(2024, 1, 15)]
    t0 = time.perf_counter()
    n_one = M.refresh_bucket_aggregate(spark, store, agg, days=dirty, bucket="1 hour")
    one_s = time.perf_counter() - t0

    # scan-pruning evidence from the EXECUTED plan's FileScan metrics
    # (numFiles / filesSize / numPartitions after the action — what the
    # refresh's source scan actually read, not the pre-filter listing)
    def scan_metrics(frame):
        # single-column no-exchange collect: the frame's own QE executes
        # (an aggregate would run under AQE whose leaves hide the
        # FileScan metrics), and the scan reads only the partition column
        narrow = frame.select(M.PARTITION_COL)
        narrow.collect()
        out = {}
        leaves = narrow._jdf.queryExecution().executedPlan().collectLeaves()
        for i in range(leaves.size()):
            m = leaves.apply(i).metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = out.get(kv._1(), 0) + kv._2().value()
        return out

    whole = M.read_table(spark, store)
    pruned = whole.where(F.col(M.PARTITION_COL).isin([d.isoformat() for d in dirty]))
    m_one, m_all = scan_metrics(pruned), scan_metrics(whole)

    print(
        f"ca_refresh  {copies}x store rows={big.count():,}  partitions={n_full}  "
        f"full refresh {full_s:5.1f} s"
    )
    print(
        f"ca_refresh  one dirty day: {n_one} partition, {one_s:5.1f} s  "
        f"scan read {m_one['numPartitions']}/{m_all['numPartitions']} partitions, "
        f"{m_one['numFiles']}/{m_all['numFiles']} files, "
        f"{m_one['filesSize']:,}/{m_all['filesSize']:,} bytes "
        f"({100 * m_one['filesSize'] / m_all['filesSize']:.1f}%)"
    )
    assert m_one["numPartitions"] == 1 and m_one["filesSize"] < m_all["filesSize"] / 10


def cascade_refresh_pruning(spark, tmp: Path, copies: int = 10) -> None:
    """r7: the HIERARCHICAL cascade's dirty-day refresh
    (refresh_rollup_cascade). Evidence that a one-day refresh (a) reads
    one raw partition, (b) re-finalizes the daily level from ONE
    hourly partition (hours x types rows, never raw), and (c) the
    refreshed daily store still hashes equal to the direct daily
    aggregate (the a13b oracle gate covers the value identity; here we
    show the scan economics)."""
    ev = load(spark, SF, "events").select(
        F.col("event_id").alias("reading_id"),
        F.col("user_id").cast("string").alias("device_id"),
        F.col("event_type").alias("device_type"),
        F.col("ts").alias("timestamp"),
        F.col("value"),
        (F.col("value") > 150.0).alias("is_anomaly"),
    )
    big = ev
    for i in range(1, copies):
        big = big.unionByName(
            ev.withColumn("reading_id", F.col("reading_id") + i * 10_000_000)
        )
    raw = str(tmp / "cascade_raw")
    hourly = str(tmp / "cascade_hourly")
    daily = str(tmp / "cascade_daily")
    M.write_partitioned(big, raw, mode="overwrite")

    t0 = time.perf_counter()
    n_full = M.refresh_rollup_cascade(spark, raw, hourly, daily)
    full_s = time.perf_counter() - t0

    dirty = [date(2024, 1, 15)]
    t0 = time.perf_counter()
    M.refresh_rollup_cascade(spark, raw, hourly, daily, days=dirty)
    one_s = time.perf_counter() - t0

    def scan_metrics(frame):
        narrow = frame.select(M.PARTITION_COL)
        narrow.collect()
        out = {}
        leaves = narrow._jdf.queryExecution().executedPlan().collectLeaves()
        for i in range(leaves.size()):
            m = leaves.apply(i).metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = out.get(kv._1(), 0) + kv._2().value()
        return out

    sel = [d.isoformat() for d in dirty]
    raw_one = scan_metrics(
        M.read_table(spark, raw).where(F.col(M.PARTITION_COL).isin(sel))
    )
    raw_all = scan_metrics(M.read_table(spark, raw))
    h_one = scan_metrics(
        M.read_table(spark, hourly).where(F.col(M.PARTITION_COL).isin(sel))
    )
    h_all = scan_metrics(M.read_table(spark, hourly))
    print(
        f"cascade_refresh  {copies}x raw rows={big.count():,}  days={n_full}  "
        f"full {full_s:5.1f} s  one dirty day {one_s:5.1f} s"
    )
    print(
        f"cascade_refresh  raw scan {raw_one['numPartitions']}/{raw_all['numPartitions']} partitions "
        f"{raw_one['filesSize']:,}/{raw_all['filesSize']:,} bytes "
        f"({100 * raw_one['filesSize'] / raw_all['filesSize']:.1f}%); "
        f"daily re-finalize reads hourly {h_one['numPartitions']}/{h_all['numPartitions']} partitions "
        f"{h_one['filesSize']:,}/{h_all['filesSize']:,} bytes "
        f"({100 * h_one['filesSize'] / h_all['filesSize']:.1f}%)"
    )
    assert raw_one["numPartitions"] == 1 and h_one["numPartitions"] == 1


def ivfpq_recall_sweep(spark, fast: bool) -> None:
    """r9: the COMPRESSED index's operating points — ivfpq_recall_report
    (recall@10 vs exact brute) on the same planted clusters at 1x and
    10x. The fixture is deliberately hard for PQ: every in-cluster
    candidate sits at cosine ~0.996+, so the exact top-10 ordering lies
    BELOW code resolution — the pure-ADC rows measure that distortion
    ladder (m x log2(pq_k) bits/vector), and the refined rows measure
    what serving actually ships: ADC retrieves rf*k candidates, exact
    cosine re-ranks them (ivfpq_topk_batch_refined, the FAISS
    IndexRefineFlat pattern). Gate: the production point (16 B/vector
    + rf=4) holds >= 0.9 at BOTH scales."""
    scales = [1] if fast else [1, 10]
    for scale in scales:
        n = 10_000 * scale
        emb = planted_embeddings(spark, n).cache()
        emb.count()
        for m, pq_k, nprobe, rf, gate in (
            (4, 16, 4, None, None),    # 2 B/vec: distortion floor
            (4, 256, 8, None, None),   # 4 B/vec, classic 8-bit codes
            (16, 256, 8, None, None),  # 16 B/vec: ADC alone still short
            (4, 256, 8, 4, None),      # 4 B/vec + refine
            (16, 256, 8, 4, 0.9),      # production point + refine
        ):
            t0 = time.perf_counter()
            rep = similarity.ivfpq_recall_report(
                emb, k=10, nprobe=nprobe, max_queries=200,
                m=m, pq_k=pq_k, n_iter=4, refine_factor=rf,
            ).agg(
                F.round(F.avg("recall"), 4).alias("avg"),
                F.round(F.min("recall"), 4).alias("min"),
                F.count(F.lit(1)).alias("n_q"),
            ).first()
            dt = time.perf_counter() - t0
            print(
                f"ivfpq_recall  n={n:>7,}  m={m:>2} pq_k={pq_k:>3} "
                f"nprobe={nprobe} refine={str(rf):>4}  "
                f"recall@10 avg={rep['avg']:.4f} min={rep['min']:.4f}  "
                f"({rep['n_q']} queries, {dt:5.1f} s)"
            )
            if gate is not None:
                assert rep["avg"] >= gate, (
                    f"ivfpq recall {rep['avg']} < {gate} at n={n}, pq_k={pq_k}"
                )
        emb.unpersist()


def main() -> None:
    fast = "--fast" in sys.argv
    spark = get_spark("probe_r07")
    spark.sparkContext.setLogLevel("ERROR")
    if "--ivfpq-only" in sys.argv:
        ivfpq_recall_sweep(spark, fast)
        return
    recall_sweep(spark, fast)
    ivfpq_recall_sweep(spark, fast)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        refresh_pruning(spark, Path(td), copies=2 if fast else 10)
    with tempfile.TemporaryDirectory() as td:
        cascade_refresh_pruning(spark, Path(td), copies=2 if fast else 10)


if __name__ == "__main__":
    main()
