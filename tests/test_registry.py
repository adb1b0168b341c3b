"""Registry-vs-driver-gate completeness (round-3 verdict item #1).

The driver's correctness gate runs every `queries()` entry against its
DuckDB oracle at sf0.01 and records the results in CORRECTNESS_r{N}.json.
In round 3 the registry grew AFTER the gate ran, so three queries shipped
with only the local sf0.001 replay as evidence. This test makes that
state impossible to ship silently: every registry entry must either have
a green row in the newest CORRECTNESS file or be explicitly declared in
NEW_SINCE_DRIVER (queries added since the last driver run — emptied at
the start of the next round once the new CORRECTNESS file lands).
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries added after the most recent driver gate ran. Adding a name here
# is a conscious declaration that it is verified only by the local
# tests/test_contract.py replay until the next CORRECTNESS_r{N}.json.
NEW_SINCE_DRIVER: "set[str]" = {
    # registered late in round 3, after the r03 driver gate ran; green in
    # the local replay, pending their first driver rows in CORRECTNESS_r04
    "ann_ivf_topk",
    "dup_clusters",
    "dedup_survivors",
    # added in round 4 (before the r04 driver gate)
    "dup_clusters_two_phase",
    "corpus_prep",
    "embedding_dedup_survivors",
}


def _latest_correctness() -> "tuple[str, dict]":
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    assert files, "no CORRECTNESS files recorded"
    latest = max(files, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    with open(latest) as f:
        return os.path.basename(latest), json.load(f)


def test_every_query_has_a_driver_row_or_is_declared_new():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as em

    fname, rows = _latest_correctness()
    registry = set(em.queries())
    missing = registry - set(rows) - NEW_SINCE_DRIVER
    assert not missing, (
        f"queries with no row in {fname} and not declared NEW_SINCE_DRIVER: "
        f"{sorted(missing)}"
    )
    stale = NEW_SINCE_DRIVER & set(rows)
    assert not stale, (
        f"NEW_SINCE_DRIVER entries already covered by {fname} — remove: "
        f"{sorted(stale)}"
    )
    gone = NEW_SINCE_DRIVER - registry
    assert not gone, f"NEW_SINCE_DRIVER entries not in the registry: {sorted(gone)}"


def test_driver_rows_all_green_and_map_to_registry():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as em

    fname, rows = _latest_correctness()
    registry = set(em.queries())
    orphans = set(rows) - registry
    assert not orphans, f"driver rows for unknown queries in {fname}: {sorted(orphans)}"
    bad = {
        name: rec
        for name, rec in rows.items()
        if rec.get("err") or not (rec.get("rows_match") and rec.get("schema_match"))
    }
    assert not bad, f"non-green driver rows in {fname}: {sorted(bad)}"


def test_every_query_has_an_oracle_or_documented_exemption():
    """Each queries() entry should carry an oracle_sql() entry; genuinely
    non-SQL-expressible ops must be a conscious, short list."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as em

    no_oracle = set(em.queries()) - set(em.oracle_sql())
    assert no_oracle == set(), (
        f"queries without an oracle (driver falls back to rows-only): "
        f"{sorted(no_oracle)}"
    )
