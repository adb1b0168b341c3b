"""Registry-vs-driver-gate completeness (round-3/4 verdict item #1).

The driver's correctness gate runs the FIRST 50 `queries()` entries against
their DuckDB oracles at sf0.01 and records the results in
CORRECTNESS_r{N}.json. With a 56-entry registry that window cannot cover
everything in one round, so `contract_queries()` orders the registry by
least-recently-driver-verified first (`_driver_rotation_order`): queries
with no driver row in ANY round sort to the front, and every query gets a
row on a bounded rotation (at most 2 rounds between rows at 56/50).

These tests pin the invariants:
 1. ordering is non-decreasing in "last round verified" (rotation holds);
 2. any query never verified by any round's driver sits inside the first-50
    window, so it provably gets a row on the next driver run;
 3. driver rows map to real registry entries and are all green;
 4. every query has an oracle (no silent rows-only fallback).

NEW_SINCE_DRIVER remains as an escape hatch for queries added mid-round
AFTER the gate ran in numbers that overflow even the rotation window; with
rotation in place it should normally stay empty.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_WINDOW = 50

# Queries added since the most recent driver gate ran, in excess of what the
# rotation window can absorb. Adding a name here is a conscious declaration
# that it is verified only by the local tests/test_contract.py replay until
# the next CORRECTNESS_r{N}.json. Emptied each round once the file lands.
NEW_SINCE_DRIVER: "set[str]" = set()


def _correctness_files() -> "list[tuple[int, dict]]":
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    assert files, "no CORRECTNESS files recorded"
    out = []
    for p in files:
        rnd = int(re.search(r"_r(\d+)", os.path.basename(p)).group(1))
        with open(p) as f:
            out.append((rnd, json.load(f)))
    return sorted(out)


def _registry() -> "list[str]":
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as em

    return list(em.queries())


def _last_round_verified() -> "dict[str, int]":
    last: "dict[str, int]" = {}
    for rnd, rows in _correctness_files():
        for name in rows:
            last[name] = max(last.get(name, -1), rnd)
    return last


def test_rotation_order_is_least_recently_verified_first():
    order = _registry()
    last = _last_round_verified()
    ranks = [last.get(n, -1) for n in order]
    assert ranks == sorted(ranks), (
        "registry is not ordered least-recently-driver-verified first; "
        f"ranks in registry order: {list(zip(order, ranks))}"
    )


def test_never_verified_queries_sit_inside_the_driver_window():
    order = _registry()
    last = _last_round_verified()
    never = [n for n in order if n not in last and n not in NEW_SINCE_DRIVER]
    outside = [n for n in never if order.index(n) >= DRIVER_WINDOW]
    assert not outside, (
        "queries never driver-verified in any round sit outside the first "
        f"{DRIVER_WINDOW} registry positions and will not get a row next "
        f"run: {outside}"
    )


def test_every_query_verified_within_rotation_bound():
    """With rotation, no query should go more than 2 rounds without a
    driver row once it has had its first one (56 entries / 50-row window)."""
    order = _registry()
    last = _last_round_verified()
    latest_round = max(rnd for rnd, _ in _correctness_files())
    stale = {
        n: last[n]
        for n in order
        if n in last and latest_round - last[n] >= 2 and order.index(n) >= DRIVER_WINDOW
    }
    assert not stale, (
        f"queries ≥2 rounds since last driver row AND outside the window "
        f"(rotation broken): {stale}"
    )


def test_new_since_driver_bookkeeping():
    order = set(_registry())
    latest_rows = set(_correctness_files()[-1][1])
    stale = NEW_SINCE_DRIVER & latest_rows
    assert not stale, f"NEW_SINCE_DRIVER entries already driver-covered: {sorted(stale)}"
    gone = NEW_SINCE_DRIVER - order
    assert not gone, f"NEW_SINCE_DRIVER entries not in the registry: {sorted(gone)}"


def test_driver_rows_all_green_and_map_to_registry():
    registry = set(_registry())
    fname_rounds = _correctness_files()
    rnd, rows = fname_rounds[-1]
    orphans = set(rows) - registry
    assert not orphans, f"driver rows for unknown queries in r{rnd}: {sorted(orphans)}"
    bad = {
        name: rec
        for name, rec in rows.items()
        if rec.get("err") or not (rec.get("rows_match") and rec.get("schema_match"))
    }
    assert not bad, f"non-green driver rows in r{rnd}: {sorted(bad)}"


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
