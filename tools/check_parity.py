"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
DuckDB twin; compares row count, column names, and an order-insensitive
value multiset (normalized: timestamps->iso, Decimal->str, float->repr).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import TABLES  # noqa: E402

SF_DIR_DEFAULT = "/root/testdata/sf0.01"


def norm_cell(v):
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return f"b:{v}"
    return str(v) if v is not None else "\x00NULL"


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = SF_DIR_DEFAULT
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(args) or set(qs)

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in sorted(qs.items()):
        if name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        else:
            ns, nd = norm_rows(scols, [tuple(r) for r in srows]), norm_rows(dcols, drows)
            if ns != nd:
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(srows)} rows match oracle")

    print(f"\n{len(only) - len(failures)}/{len(only)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
