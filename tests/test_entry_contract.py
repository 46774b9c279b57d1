"""Driver-contract invariants for __spark_entry__.py.

The driver's correctness gate records rows for roughly the first 50
``queries()`` entries per round, so the explicit DRIVER_ORDER /
TAIL_ORDER lists ARE the row budget — these tests keep them in sync
with the actual registrations so a newly added operator can't silently
land outside the ordering policy (or fall off the driver window
unnoticed).
"""

from __future__ import annotations

import __spark_entry__ as E


def test_order_lists_cover_exactly_the_registered_queries():
    registered = set(E.queries().keys())
    listed = set(E.DRIVER_ORDER) | set(E.TAIL_ORDER)
    assert set(E.DRIVER_ORDER).isdisjoint(E.TAIL_ORDER)
    missing = registered - listed
    stale = listed - registered
    assert not missing, f"register new queries in DRIVER_ORDER/TAIL_ORDER: {missing}"
    assert not stale, f"remove unregistered names from the order lists: {stale}"


def test_queries_dict_iterates_in_driver_order():
    names = list(E.queries().keys())
    assert names == E.DRIVER_ORDER + E.TAIL_ORDER


def test_driver_window_holds_the_untested_before_the_tail():
    # every name in the tail had a green CORRECTNESS_r01 row; the driver
    # window (first 50) must contain the whole DRIVER_ORDER list
    assert len(E.DRIVER_ORDER) <= 50, (
        "DRIVER_ORDER exceeds the observed driver row budget; move "
        "redundant entries to TAIL_ORDER"
    )


def test_every_oracle_key_has_a_query():
    qs, oracles = set(E.queries()), set(E.oracle_sql())
    assert oracles <= qs, f"oracle without query: {oracles - qs}"
