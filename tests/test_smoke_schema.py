"""Analysis-only smoke test over the driver's real testdata.

Forces Catalyst analysis (``.schema``) of every registered query against
``/root/testdata/sf0.001`` without executing anything. This catches
testdata schema drift (e.g. the round-3 TIMESTAMP_NTZ regression, where
``events.ts`` changed physical type and ``unix_micros`` started raising
AnalysisException) in seconds instead of a full driver round.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} not present"
)

_QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_analyzes(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    # .schema triggers full analysis (resolution + type checking), no jobs.
    assert len(df.schema.fields) > 0


def test_entry_analyzes(spark):
    df = entry.entry(spark)
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    extra = set(entry.oracle_sql()) - set(_QUERIES)
    assert not extra, f"oracle_sql keys with no queries() entry: {sorted(extra)}"
