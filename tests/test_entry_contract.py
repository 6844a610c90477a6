"""Pins the driver-contract shape of __spark_entry__:

* the first 50 registry entries (the driver's CORRECTNESS window) are all
  oracled and are exactly the 50 distinct operators in _PRIORITY[:50];
* every oracled entry, demoted or not, still has a runnable SQL twin;
* _PRIORITY names only real registry entries (no typo'd reorder).
"""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_priority_names_are_registry_entries():
    missing = [n for n in entry_mod._PRIORITY if n not in entry_mod._REGISTRY]
    assert missing == []


def test_driver_window_is_all_oracled():
    names = list(entry_mod._REGISTRY)
    window = names[: entry_mod._DRIVER_WINDOW]
    oracle = entry_mod.oracle_sql()
    unoracled = [n for n in window if n not in oracle]
    assert unoracled == [], f"rows-only entries inside the driver window: {unoracled}"


def test_driver_window_matches_priority_prefix():
    names = list(entry_mod._REGISTRY)
    assert names[: entry_mod._DRIVER_WINDOW] == entry_mod._PRIORITY[:50]


def test_flagship_new_components_have_driver_rows():
    """VERDICT r2 #1: the round-2 flagship components must sit inside the
    driver's recorded window."""
    window = set(list(entry_mod._REGISTRY)[: entry_mod._DRIVER_WINDOW])
    for name in (
        "ann_cosine_topk",
        "embedding_near_dup",
        "s5_batched_lookup",
        "u1_handler_dispatch",
        "entity_balances_replay",
        "entity_users_get_or_create",
        "backfill_reindex_progress",
    ):
        assert name in window, name


def test_demoted_duplicates_still_oracled():
    oracle = entry_mod.oracle_sql()
    for name in entry_mod._PRIORITY[50:]:
        assert name in oracle, name
