"""Registry consistency gates — no Spark session, ~1 ms.

Round 8 shipped a query registered via @q but absent from QUERY_ORDER;
the assertion inside get_queries() then broke EVERY consumer (driver
correctness run, driver bench, pytest collection of the smoke module).
These tests make that mismatch a single, clearly-named failure instead
of a suite-wide collapse — run them first, they import nothing heavy.
"""

from __future__ import annotations

from metrocloud_data_pipeline_spark import queries as q


def test_query_order_matches_registered_queries():
    missing = set(q.SPARK_QUERIES) - set(q.QUERY_ORDER)
    extra = set(q.QUERY_ORDER) - set(q.SPARK_QUERIES)
    assert not missing, f"registered via @q but absent from QUERY_ORDER: {sorted(missing)}"
    assert not extra, f"in QUERY_ORDER but never registered: {sorted(extra)}"


def test_query_order_has_no_duplicates():
    dupes = [n for n in set(q.QUERY_ORDER) if q.QUERY_ORDER.count(n) > 1]
    assert not dupes, f"duplicate QUERY_ORDER entries: {sorted(dupes)}"


def test_oracle_keys_are_registered_queries():
    extra = set(q.ORACLE_SQL) - set(q.SPARK_QUERIES)
    assert not extra, f"oracle SQL with no queries() entry: {sorted(extra)}"


def test_get_queries_returns_full_ordered_registry():
    got = q.get_queries()
    assert list(got) == q.QUERY_ORDER
    assert len(got) == len(q.SPARK_QUERIES)


def test_oracles_are_nonempty_single_statements():
    for name, sql in q.ORACLE_SQL.items():
        assert sql.strip(), f"{name}: empty oracle"
        # a trailing semicolon or second statement breaks the driver's
        # duckdb .execute(...).df() single-result contract
        assert ";" not in sql.strip().rstrip(";"), f"{name}: multi-statement oracle"
