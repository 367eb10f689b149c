"""Capture .explain('formatted') for every HEADLINE query -> plans/r16/.

Optimization-round evidence artifact: one <query>_before.txt per
HEADLINE key at the start of the round, and <query>_after.txt for the
keys the round touched (pass --after). Plans are taken at sf0.001
(plan shape is scale-independent; AQE numbers differ at runtime).
"""

from __future__ import annotations

import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
OUT = Path(__file__).resolve().parent.parent / "plans" / "r16"


def plan_string(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    from metrocloud_data_pipeline_spark.queries import get_queries
    from metrocloud_data_pipeline_spark.session import get_spark

    suffix = "_after.txt" if "--after" in sys.argv[1:] else "_before.txt"
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-dump-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()
    for name in names:
        try:
            txt = plan_string(qs[name](spark, SF))
        except Exception:
            txt = "PLAN FAILED\n" + traceback.format_exc()
        (OUT / f"{name}{suffix}").write_text(txt)
        print(name, "ok" if "PLAN FAILED" not in txt else "FAIL")


if __name__ == "__main__":
    main()
