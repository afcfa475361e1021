"""The bench clobber guard is keyed on the MEASURED OUTCOME: a re-run
that is not better (more steal flags, slower flagship, or lower
amplified throughput) must never displace a committed record, even if
its CPU-probe floor looks cleaner (round 5: a 0.293-floor driver
re-run displaced the 508k docs/s record under the old probe-keyed
guard; the probe cannot see IO storms)."""

from __future__ import annotations


def _rec(flagged=0, value=1.0, amp=500_000.0, probe=0.31):
    return {
        "steal_flagged": ["q"] * flagged,
        "value": value,
        "amplified_docs_per_sec": amp,
        "probe_floor_sec": probe,
    }


def test_outcome_key_orders_better_records_first():
    from bench import record_outcome_key as key

    committed = _rec(flagged=4, value=1.662, amp=507785.5, probe=0.314)
    # THE round-5 incident: cleaner probe, worse outcome -> must lose
    rerun = _rec(flagged=4, value=1.692, amp=438838.3, probe=0.293)
    assert key(rerun) > key(committed)

    # strictly better outcomes win regardless of probe floor
    assert key(_rec(flagged=3, value=2.0, amp=1.0, probe=0.9)) < key(committed)
    assert key(_rec(flagged=4, value=1.5, amp=400000.0, probe=0.9)) < key(committed)
    assert key(_rec(flagged=4, value=1.662, amp=600000.0, probe=0.9)) < key(committed)

    # probe floor only breaks exact outcome ties
    tie_clean = _rec(flagged=4, value=1.662, amp=507785.5, probe=0.293)
    assert key(tie_clean) < key(committed)


def test_outcome_key_tolerates_missing_fields():
    from bench import record_outcome_key as key

    # a record with no amplified stage (bench run without amp) sorts
    # after one that measured it, all else equal
    no_amp = {"steal_flagged": [], "value": 1.0, "probe_floor_sec": 0.3}
    with_amp = _rec(flagged=0, value=1.0, amp=100.0, probe=0.3)
    assert key(no_amp) > key(with_amp)
    # and never raises
    assert isinstance(key({}), tuple)


def test_outcome_key_treats_error_sentinel_as_worst():
    from bench import record_outcome_key as key

    committed = _rec(flagged=4, value=1.662, amp=507785.5, probe=0.314)
    # a crashed flagship records value=-1.0 and is NOT flagged — it
    # must sort after any real measurement, not before
    crashed = _rec(flagged=4, value=-1.0, amp=507785.5, probe=0.2)
    assert key(crashed) > key(committed)
    assert key(_rec(value=0.0)) > key(_rec(value=5.0))
