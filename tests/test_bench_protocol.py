"""Unit tests for bench.py's interleaved adaptive scaling scheduler.

The r5 protocol (VERDICT r4 next-round #1): while nothing is banked,
attempts alternate between the 1→4 and 2→8 pairs; once 1→4 banks, all
remaining budget retries the 2→8 upgrade; calibrations below a pair's
floor pre-gate the attempt without consuming its cap.  These tests drive
``run_scaling_protocol`` with fake measure/calibrate/clock — no Spark.
"""

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_mod", bench)
_spec.loader.exec_module(bench)

PAIRS = (((1, 4), 10.0, 5), ((2, 8), 16.0, 8))


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        self.t += 1.0  # every observation advances 1 "second"
        return self.t

    def sleep(self, s):
        self.t += s


def run(measure, calibrate, **kw):
    clk = FakeClock()
    kw.setdefault("pairs", PAIRS)
    kw.setdefault("clock", clk)
    kw.setdefault("sleep", clk.sleep)
    kw.setdefault("retry_sleep", 5.0)
    return bench.run_scaling_protocol(measure, calibrate, **kw)


def test_first_attempt_banks_robust_pair_then_upgrades():
    """Both pairs pass on their first try → 2→8 (the largest) is accepted."""
    def measure(cpus, walls=2):
        return {"docs_per_sec": 1000.0 * cpus}  # perfectly linear: eff 1.0

    accepted, flag, attempts = run(measure, lambda: 30.0)
    assert flag
    assert accepted["pair"] == [2, 8]
    assert accepted["efficiency"] == 1.0
    # 1→4 banked first, then the scheduler moved to 2→8
    assert [a["pair"] for a in attempts] == [[1, 4], [2, 8]]


def test_interleaves_pairs_while_unbanked():
    """Failed attempts alternate 1→4, 2→8, 1→4, … (not 5× 1→4 first)."""
    def measure(cpus, walls=2):
        return {"docs_per_sec": 500.0 * cpus ** 0.5}  # eff ~0.5: always fails

    _, flag, attempts = run(measure, lambda: 30.0)
    assert not flag
    seq = [tuple(a["pair"]) for a in attempts]
    assert seq[:4] == [(1, 4), (2, 8), (1, 4), (2, 8)]
    # caps respected: 5 attempts for (1,4), 8 for (2,8)
    assert seq.count((1, 4)) == 5 and seq.count((2, 8)) == 8


def test_pregate_skips_measurement_without_consuming_cap():
    calls = []

    def measure(cpus, walls=2):
        calls.append(cpus)
        return {"docs_per_sec": 1000.0 * cpus}

    cal_values = iter([5.0, 5.0, 30.0, 30.0, 30.0, 30.0, 30.0, 30.0])

    def calibrate():
        return next(cal_values, 30.0)

    accepted, flag, attempts = run(measure, calibrate)
    assert flag
    pregates = [a for a in attempts if a.get("pregated")]
    assert len(pregates) == 2  # the two bad-window calibrations
    # no measurement happened during the pregated windows: the first
    # measured side is the (interleave-order) pair's lo side
    measured = [a for a in attempts if not a.get("pregated")]
    assert calls[0] == measured[0]["pair"][0]
    # pregates consumed no cap: both pairs still bankable afterwards
    assert measured and measured[0]["efficiency"] == 1.0


def test_after_banking_only_larger_pair_retried():
    """1→4 passes, 2→8 keeps failing → remaining attempts are all 2→8."""
    def measure(cpus, walls=2):
        if cpus in (1, 4):
            return {"docs_per_sec": 1000.0 * cpus}  # eff 1.0 → banks
        return {"docs_per_sec": 400.0 * cpus ** 0.5}  # 2→8 eff 0.5 → fails

    accepted, flag, attempts = run(measure, lambda: 30.0)
    assert flag
    assert accepted["pair"] == [1, 4]  # upgrade never banked
    seq = [tuple(a["pair"]) for a in attempts]
    assert seq[0] == (1, 4)
    assert all(p == (2, 8) for p in seq[1:])
    assert seq.count((2, 8)) == 8  # full upgrade budget spent


def test_upgrade_banked_replaces_robust():
    """2→8 passes on its 3rd try → it wins over the banked 1→4."""
    n28 = {"n": 0}

    def measure(cpus, walls=2):
        if cpus in (1, 4):
            return {"docs_per_sec": 1000.0 * cpus}
        n28["n"] += 1
        if n28["n"] >= 5:  # 3rd paired attempt (2 calls each: lo then hi)
            return {"docs_per_sec": 950.0 * cpus}
        return {"docs_per_sec": 400.0 * cpus ** 0.5}

    accepted, flag, attempts = run(measure, lambda: 30.0)
    assert flag
    assert accepted["pair"] == [2, 8]


def test_capacity_invalid_attempt_never_banks():
    def measure(cpus, walls=2):
        return {"docs_per_sec": 1000.0 * cpus}  # eff 1.0 but host is bad

    accepted, flag, attempts = run(measure, lambda: 8.0)  # below both floors
    assert not flag
    assert accepted is None
    assert all(a.get("pregated") for a in attempts)


def test_time_budget_bounds_pregate_loop():
    """A permanently bad window terminates via the time budget."""
    accepted, flag, attempts = run(
        lambda cpus, walls=2: {"docs_per_sec": 1.0},
        lambda: 5.0, time_budget=100.0)
    assert not flag and accepted is None
    assert len(attempts) >= 1  # at least one pregate recorded


def test_cpuset_pregate_blocks_then_passes():
    """Cpuset calibration below 0.7×width pregates; a later good one runs."""
    cvals = iter([4.0, 7.5])  # width 8 (pair 1→4): floor is 5.6

    def measure(cpus, walls=2):
        return {"docs_per_sec": 1000.0 * cpus}

    accepted, flag, attempts = run(
        measure, lambda: 30.0,
        pairs=(((1, 4), 10.0, 3),),
        cpuset_calibrate=lambda w: next(cvals, 7.5))
    assert flag
    pregates = [a for a in attempts if a.get("pregated")]
    assert len(pregates) == 1 and pregates[0]["cpuset_cal"] == 4.0
    assert accepted["cpuset_cal"] == 7.5


def test_cpuset_starvation_bypass():
    """Past half the budget, an unmeasured pair runs despite a bad cpuset."""
    def measure(cpus, walls=2):
        return {"docs_per_sec": 1000.0 * cpus}

    accepted, flag, attempts = run(
        measure, lambda: 30.0,
        pairs=(((1, 4), 10.0, 3),),
        cpuset_calibrate=lambda w: 1.0,  # permanently terrible cpuset
        time_budget=200.0)
    # the bypass eventually lets one measurement through
    measured = [a for a in attempts if not a.get("pregated")]
    assert measured, "starvation bypass never fired"
    assert flag  # eff 1.0, host cal valid → banks


def test_walls_passed_per_side():
    seen = {}

    def measure(cpus, walls=2):
        seen[cpus] = walls
        return {"docs_per_sec": 1000.0 * cpus}

    run(measure, lambda: 30.0)
    assert seen[1] == bench.SCALE_WALLS_LO
    assert seen[4] == bench.SCALE_WALLS_HI
