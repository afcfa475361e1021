"""Registry contract: the driver's correctness check records rows for
at most the FIRST 50 registry entries (in iteration order), so the
registry must stay at or under 50 names — and every name must carry a
full DuckDB oracle so no query ever falls back to the weaker
rows-only check."""

from __future__ import annotations

DRIVER_CHECK_LIMIT = 50


def test_registry_fits_driver_check():
    from vrl_spark import registry

    names = list(registry.queries())
    assert len(names) <= DRIVER_CHECK_LIMIT, (
        f"{len(names)} registry entries > driver's {DRIVER_CHECK_LIMIT}-row "
        f"correctness budget; consolidate (see plans/queries_textops.py "
        f"merged-vehicle section) before adding more: {names}"
    )


def test_every_query_has_full_oracle():
    from vrl_spark import registry

    q, o = set(registry.queries()), set(registry.oracle_sql())
    assert q == o, (q - o, o - q)


def test_registry_names_unique_and_callable():
    from vrl_spark import registry

    qs = registry.queries()
    assert all(callable(fn) for fn in qs.values())
    # oracle SQL strings must be non-trivial
    for name, sql in registry.oracle_sql().items():
        assert isinstance(sql, str) and len(sql.strip()) > 20, name
