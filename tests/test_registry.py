"""Driver-contract guards: the query registry and its priority prefix."""

import __ray_entry__ as entry


def test_registry_integrity():
    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) >= 100
    assert set(o) <= set(q)
    # the driver checks the FIRST 50 queries in dict order: every one
    # must be oracle-paired (a rows-only entry there wastes a slot)
    first50 = list(q)[:50]
    assert len(first50) == 50
    unpaired = [k for k in first50 if k not in o]
    assert not unpaired, f"unpaired in priority-50: {unpaired}"
    # priority list must reference real queries only (a typo would
    # KeyError inside _all_query_entries and take down the whole driver)
    assert set(entry._PRIORITY) <= set(q)
    assert len(set(entry._PRIORITY)) == len(entry._PRIORITY)


def test_oracle_sql_strings_are_runnable_shapes():
    """Every oracle is a non-empty SELECT/WITH statement (full execution
    is tests/test_oracle.py's job; this catches registration slips)."""
    for name, sql in entry.oracle_sql().items():
        body = sql.strip().lower()
        assert body.startswith(("select", "with")), name
