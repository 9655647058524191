"""Docs ↔ registry consistency guards."""

from __future__ import annotations

import re

from queue_system_simulator_spark.plans import QUERIES, all_queries


def test_readme_counts_match_registry():
    src = open("/root/repo/README.md").read()
    m = re.search(
        r"# (\d+) registered queries \((\d+) oracle-backed driver-facing "
        r"\+ (\d+) rows-only pytest-gated\)",
        src,
    )
    assert m, "README layout line with query counts missing"
    assert int(m.group(1)) == len(QUERIES)
    n_oracle = sum(1 for s in QUERIES.values() if s.oracle is not None)
    assert int(m.group(2)) == n_oracle
    assert int(m.group(2)) == len(all_queries())  # rows-only NOT exposed
    assert int(m.group(3)) == len(QUERIES) - n_oracle


def test_queries_md_count_matches_registry():
    src = open("/root/repo/QUERIES.md").read()
    m = re.search(r"(\d+) queries, (\d+) oracle-checked, (\d+) rows-only", src)
    assert m
    assert int(m.group(1)) == len(QUERIES)
    n_oracle = sum(1 for s in QUERIES.values() if s.oracle is not None)
    assert int(m.group(2)) == n_oracle
    assert int(m.group(3)) == len(QUERIES) - n_oracle


def test_driver_window_is_exactly_fifty_and_oracled():
    from queue_system_simulator_spark.plans import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    q = all_queries()
    assert list(q)[:50] == DRIVER_WINDOW
    # The driver has no rows-only check (err:"no_oracle" in r01 AND r07),
    # so every graded window slot must carry an oracle.
    for name in DRIVER_WINDOW:
        assert QUERIES[name].oracle is not None, name
    # And rows-only entries must not reach the driver map at all.
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            assert name not in q, name
