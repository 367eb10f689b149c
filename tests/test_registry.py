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


def test_driver_freshness_debt_is_in_the_window():
    """Every query whose newest green driver CORRECTNESS row is >= 6
    rounds old must sit inside the 50-slot driver window, i.e. the next
    driver run will refresh it.  The round-9 tree violated this
    (seq_pack_summary age 6 sat below the cutoff while new keys took
    the window), which let a quarter of the surface go 4+ rounds
    without a hard-signal row.  Threshold 6, not 5: a 50-slot window
    over a ~200-key registry cycles in ~4.1 rounds, and an n+1-key
    backlog legitimately parks exactly one key one extra round (the
    r10 case: 51 stale keys).  Fix on failure: move the named keys to
    the head of QUERY_ORDER.
    """
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1] / "tools"))
    from freshness import staleness_report

    rep = staleness_report(q.QUERY_ORDER, window=50, max_age=6)
    assert not rep["stale_outside_window"], (
        "stale queries outside the driver window (name, age, position): "
        f"{rep['stale_outside_window']}"
    )


def test_new_keys_have_registration_round():
    """A key with no driver row in any CORRECTNESS artifact must be in
    FIRST_REGISTERED_ROUND (tools/freshness.py) so the freshness gate
    can age it from its birth round instead of skipping it forever."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1] / "tools"))
    from freshness import FIRST_REGISTERED_ROUND, latest_green_rounds

    latest, _ = latest_green_rounds()
    never_checked = [
        name for name in q.QUERY_ORDER
        if name not in latest and name not in FIRST_REGISTERED_ROUND
    ]
    assert not never_checked, (
        "queries with no driver row and no registration round recorded: "
        f"{never_checked} — add them to FIRST_REGISTERED_ROUND"
    )


def test_oracles_are_nonempty_single_statements():
    for name, sql in q.ORACLE_SQL.items():
        assert sql.strip(), f"{name}: empty oracle"
        # a trailing semicolon or second statement breaks the driver's
        # duckdb .execute(...).df() single-result contract
        assert ";" not in sql.strip().rstrip(";"), f"{name}: multi-statement oracle"


def test_new_key_velocity_is_capped():
    """At most NEW_KEY_CAP registered keys may lack a driver row while
    any freshness debt exists (a never-checked key, or any key at
    age >= 4). The 50-slot window re-verifies ~a quarter of the surface
    per round; a round that registers 11+ new keys while old ones wait
    regrows the r9 backlog (51 rows stuck at age 5+) mechanically, not
    through any one bad decision. r10 held to 3 new keys by discipline;
    this makes the cap structural (VERDICT r10 advice #3)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1] / "tools"))
    from freshness import latest_green_rounds, staleness_report

    NEW_KEY_CAP = 10

    latest, _ = latest_green_rounds()
    never_checked = [n for n in q.QUERY_ORDER if n not in latest]
    rep = staleness_report(q.QUERY_ORDER, window=50, max_age=4)
    any_debt = never_checked or any(
        a is not None and a >= 4 for a in rep["ages"].values()
    )
    if any_debt:
        assert len(never_checked) <= NEW_KEY_CAP, (
            f"{len(never_checked)} keys have never earned a driver row "
            f"({never_checked}) while freshness debt exists — cap is "
            f"{NEW_KEY_CAP}; let the window catch up before registering more"
        )


def test_no_oracle_keys_each_carry_a_sanctioned_reason():
    """The driver's rows-only check is deliberately weaker than the
    hash gate, so the no-oracle class may only grow EXPLAINED (VERDICT
    r11 #5): exact set equality between the actual no-oracle key set
    and the reason registry — an unexplained new rows-only key fails,
    as does a stale reason for a key that gained an oracle — and every
    reason must name a sanctioned category (non-portable hash / seeded
    or trained model / approximate sketch / iterative algorithm) plus
    the test module holding its pinned invariant."""
    no_oracle = set(q.SPARK_QUERIES) - set(q.ORACLE_SQL)
    unexplained = no_oracle - set(q.NO_ORACLE_REASONS)
    stale = set(q.NO_ORACLE_REASONS) - no_oracle
    assert not unexplained, (
        f"rows-only keys without a reason in NO_ORACLE_REASONS: "
        f"{sorted(unexplained)} — either add the oracle_sql twin or "
        "document why none can exist and where the pinned invariant lives"
    )
    assert not stale, (
        f"NO_ORACLE_REASONS entries for keys that now have oracles (or "
        f"were removed): {sorted(stale)}"
    )
    SANCTIONED = ("hash", "seeded", "trained", "sketch", "iterative")
    for name, reason in q.NO_ORACLE_REASONS.items():
        assert any(m in reason for m in SANCTIONED), (
            f"{name}: reason names no sanctioned category {SANCTIONED}: "
            f"{reason!r}"
        )
        assert "tests/test_" in reason or "oracle-checked" in reason, (
            f"{name}: reason does not say where the pinned invariant "
            f"lives: {reason!r}"
        )


def test_no_oracle_reasons_point_at_real_test_modules():
    """A reason citing tests/test_x.py must cite a module that exists —
    a stale pointer is as useless as no pointer."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    for name, reason in q.NO_ORACLE_REASONS.items():
        for mod in re.findall(r"tests/test_[a-z_]+\.py", reason):
            assert (root / mod).exists(), f"{name}: {mod} does not exist"


def test_single_table_oracle_keys_have_edge_parity_coverage():
    """Every oracle-backed key reading exactly ONE of the three
    edge-fixtured tables (documents / events / embeddings) must appear
    in that table's edge-parity module — the r12 completeness sweep
    that found three real divergences (bigram -0.0, winnow null-text
    row, media null-payload conflation) made a standing gate, so a new
    key cannot silently skip pathological-input coverage.

    r13 extends the gate to the JOIN layer (VERDICT r12 #3): every
    oracle-backed key whose load set is any subset of the TPC-H star
    tables — multi-table joins AND the star single-table keys no other
    module fixtures — must appear in test_oracle_edge_parity_joins.py's
    JOIN_QUERIES, which runs them over null join keys, dangling FKs,
    empty join sides, null measures, and duplicate-key fact bursts."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    src = (root / "metrocloud_data_pipeline_spark" / "queries.py").read_text()
    parts = re.split(r'@q\(\s*\n?\s*"([a-z0-9_]+)"', src)

    def module_list(fname: str, var: str) -> set[str]:
        t = (root / "tests" / fname).read_text()
        body = re.search(rf"{var} = \[(.*?)\]", t, re.S).group(1)
        return set(re.findall(r'"([a-z0-9_]+)"', body))

    covered = {
        "documents": module_list("test_oracle_edge_parity.py", "DOC_QUERIES"),
        "events": module_list("test_oracle_edge_parity_events.py", "EVENT_QUERIES"),
        "embeddings": module_list(
            "test_oracle_edge_parity_embeddings.py", "EMB_QUERIES"
        ),
    }
    join_covered = module_list("test_oracle_edge_parity_joins.py", "JOIN_QUERIES")
    STAR_TABLES = {
        "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    }
    oracle_keys = set(q.ORACLE_SQL)
    missing: list[tuple[str, str]] = []
    for i in range(1, len(parts), 2):
        name, body = parts[i], parts[i + 1].split("\n@q(")[0]
        tables = set(
            re.findall(r'load\(\s*spark,\s*sf_dir,\s*"(\w+)"', body, re.S)
        )
        # the readings() helper is an events load — the first scan
        # missed 21 readings-family keys this way (and 4 of them were
        # hiding real divergences)
        if re.search(r"\breadings\(spark, sf_dir\)", body):
            tables.add("events")
        if name not in oracle_keys or not tables:
            continue
        if tables <= STAR_TABLES:
            if name not in join_covered:
                missing.append(("star-join", name))
            continue
        if len(tables) != 1:
            continue
        (table,) = tables
        if table in covered and name not in covered[table]:
            missing.append((table, name))
    assert not missing, (
        f"oracle-backed keys absent from their edge-parity module: "
        f"{sorted(missing)} — add each to the module's query list "
        "(and fix whatever the pathological fixture then finds)"
    )


def test_streaming_partition_overwrite_uses_batch_bound_session():
    """foreachBatch hands each micro-batch a frame bound to an ISOLATED
    session clone; a partitionOverwriteMode set on the outer session
    never reaches the clone, the 'dynamic' overwrite silently runs
    STATIC, and every micro-batch deletes all prior partitions — the
    r13 media-sink bug, invisible to single-batch tests. Gate: inside
    streaming modules, dynamic_partition_overwrite may only take a
    session reached through a DataFrame (.sparkSession), never a bare
    outer-session variable."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    bad: list[tuple[str, str]] = []
    for path in sorted(
        (root / "metrocloud_data_pipeline_spark" / "streaming").glob("*.py")
    ):
        for call in re.findall(
            r"with dynamic_partition_overwrite\(([^)]*)\)", path.read_text()
        ):
            if ".sparkSession" not in call:
                bad.append((path.name, call.strip()))
    assert not bad, (
        f"streaming dynamic_partition_overwrite calls not bound to the "
        f"micro-batch session: {bad} — pass <frame>.sparkSession, not the "
        "outer session"
    )


def test_streaming_appends_carry_an_at_least_once_justification():
    """Every sink a foreachBatch body writes must be effectively-once
    under redelivery (overwrite_batch_partition — batch_id dynamic
    partition overwrite) UNLESS an at-least-once append is explicitly
    justified in place: r13's side-sinks (rejects/metrics/alerts) were
    plain appends, so a crash-replay silently duplicated accounting
    rows even though every primary data store was effectively-once
    (VERDICT r13 #2). Gate: any mode("append") inside a streaming
    module must carry an 'at-least-once' marker comment within the 12
    preceding lines stating WHY redelivery cannot duplicate its rows
    (e.g. the corpus append, whose replayed rows are rejected upstream
    by the digest anti-join)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    bad: list[tuple[str, int]] = []
    for path in sorted(
        (root / "metrocloud_data_pipeline_spark" / "streaming").glob("*.py")
    ):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if 'mode("append")' not in line and "mode('append')" not in line:
                continue
            window = "\n".join(lines[max(0, i - 12) : i + 1])
            if "at-least-once" not in window:
                bad.append((path.name, i + 1))
    assert not bad, (
        f"unjustified append sinks in streaming modules: {bad} — use "
        "maintenance.overwrite_batch_partition for effectively-once, or "
        "add an 'at-least-once append by design: <why redelivery cannot "
        "duplicate>' comment"
    )
