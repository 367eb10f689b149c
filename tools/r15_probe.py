"""Per-query drill-down for the r15 optimization round.

For each named query: wall time (runs=N medians, bench methodology:
noop sink, gc between runs) plus Spark-side job/stage/task counts from
a registered SparkListener — the number that explains WHERE a small-SF
query's time goes (at sf0.1 the data is MBs; stage count x per-stage
overhead dominates, and every localCheckpoint is an extra eager job).

Usage: python tools/r15_probe.py [--runs N] [--sf DIR] name [name ...]
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Counter:
    """Py4J-backed SparkListener counting jobs/stages/tasks."""

    def __init__(self, spark):
        self.spark = spark
        self.reset()

    def reset(self):
        sc = self.spark.sparkContext
        tracker = sc.statusTracker()
        self._jobs0 = set(tracker.getJobIdsForGroup(None) or [])

    def snapshot(self):
        sc = self.spark.sparkContext
        tracker = sc.statusTracker()
        jobs = set(tracker.getJobIdsForGroup(None) or []) - self._jobs0
        stages = 0
        tasks = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        return {"jobs": len(jobs), "stages": stages, "tasks": tasks}


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    sf = SF
    names = []
    it = iter(args)
    for a in it:
        if a == "--runs":
            runs = int(next(it))
        elif a == "--sf":
            sf = next(it)
        else:
            names.append(a)

    from metrocloud_data_pipeline_spark.queries import get_queries
    from metrocloud_data_pipeline_spark.session import get_spark

    spark = get_spark("r15-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()

    # warmup (bench parity)
    for w in ("a6_table_stats", "h1_pricing_summary", "media_feature_extract",
              "knn_brute_force", "knn_join_ivf"):
        qs[w](spark, sf).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        samples = []
        meta = None
        for i in range(runs):
            c = Counter(spark)
            spark.sparkContext.setJobDescription(f"r15probe:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            samples.append(dt)
            meta = c.snapshot()
            gc.collect()
        out[name] = {
            "median_s": round(statistics.median(samples), 3),
            "all_s": [round(s, 3) for s in samples],
            **(meta or {}),
        }
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
