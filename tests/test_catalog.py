"""Registration-order invariant for the driver's first-50 sample window.

The correctness driver samples the FIRST 50 entries of
``__spark_entry__.queries()`` and runs each against its ``oracle_sql()``
twin; an entry without a twin records ``err: no_oracle`` in
CORRECTNESS_r{N}.json.  Rounds 2-4 each tripped this purely as a sampling
artifact (rows-only variants registered inside the window while their
oracle-checked twins sat outside it).  These tests make the invariant
structural: every rows-only query must register after every oracle-checked
one, so the first-50 window — and indeed any prefix up to the number of
oracle-checked queries — is fully oracle-backed.
"""

from __future__ import annotations

DRIVER_SAMPLE = 50


def _load():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


def test_first_50_all_have_oracles():
    queries, oracles = _load()
    window = list(queries)[:DRIVER_SAMPLE]
    missing = [name for name in window if name not in oracles]
    assert not missing, (
        f"driver first-{DRIVER_SAMPLE} sample window contains rows-only "
        f"queries (no oracle_sql twin): {missing}"
    )


def test_rows_only_queries_registered_last():
    queries, oracles = _load()
    names = list(queries)
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in oracles), len(names)
    )
    stragglers = [n for n in names[first_rows_only:] if n in oracles]
    assert not stragglers, (
        "oracle-checked queries registered after a rows-only one "
        f"(order invariant broken): {stragglers}"
    )


def test_oracle_keys_subset_of_queries():
    queries, oracles = _load()
    orphans = sorted(set(oracles) - set(queries))
    assert not orphans, f"oracle_sql entries without a queries() twin: {orphans}"
