"""COVERAGE.md's registry totals must match the registry itself —
the r3 verdict asked for a programmatic tie so the doc can't drift
from the code (it had a stale comment contradicting the ORACLES dict
that round)."""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod

COVERAGE = open("/root/repo/COVERAGE.md").read()


def test_registry_totals_match_coverage_md():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    m = re.search(
        r"Registry totals: \*\*(\d+) queries, (\d+) with oracles,\s*(\d+) rows-only\*\*",
        COVERAGE,
    )
    assert m, "COVERAGE.md must state 'Registry totals: **N queries, M with oracles, K rows-only**'"
    n_q, n_o, n_ro = (int(g) for g in m.groups())
    assert len(queries) == n_q, f"COVERAGE.md says {n_q} queries, registry has {len(queries)}"
    assert len(oracles) == n_o, f"COVERAGE.md says {n_o} oracles, registry has {len(oracles)}"
    assert len(queries) - len(oracles) == n_ro
    # every oracle key must be a registered query
    assert set(oracles) <= set(queries)


def test_rows_only_list_matches_coverage_md():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows_only = sorted(set(queries) - set(oracles))
    # the justification section must name each rows-only entry
    section = COVERAGE.split("rows-only entries, and why", 1)[1]
    for name in rows_only:
        assert f"`{name}`" in section, f"rows-only {name} lacks a COVERAGE.md justification"
