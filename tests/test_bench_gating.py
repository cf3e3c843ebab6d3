"""Unit tests for bench.py's write-bound sample gating (round 7).

No SparkSession needed — the gating logic is pure bookkeeping around
an injectable calibration probe, so the contamination scenarios the
shared host actually produces are reproduced deterministically here.
"""

from __future__ import annotations

import bench


def test_witness_clean_subset_drops_bracketed_dirty_sample():
    base = 400.0
    samples = [100.0, 101.0, 40.0, 99.0, 100.0]
    opens = [400.0, 400.0, 400.0, 390.0, 400.0]
    closes = [400.0, 400.0, 150.0, 400.0, 400.0]   # burst around sample 2
    pub, n_excl, ok = bench._witness_clean_subset(samples, opens, closes,
                                                  base, min_clean=3)
    assert pub == [100.0, 101.0, 99.0, 100.0] and n_excl == 1
    assert ok is True


def test_witness_clean_subset_falls_back_below_min_clean():
    base = 400.0
    samples = [100.0, 40.0, 42.0]
    opens = [400.0, 150.0, 150.0]
    closes = [150.0, 150.0, 150.0]
    pub, n_excl, ok = bench._witness_clean_subset(samples, opens, closes,
                                                  base, min_clean=2)
    # only 0 clean samples — publish everything, but witness_ok=False
    # MUST make the attempt dirty: uniform contention passes the floor
    # gate and the closing calibration can recover during the settle
    # (round-7 second pass: such a run published 'clean' decode 7x low)
    assert pub == samples and n_excl == 0
    assert ok is False
    contended = bench._pick_attempt(
        [{"floor_ratio": 1.0, "io_cal_after": base,
          "witness_ok": False, "samples": pub}], base)[1]
    assert contended is True


def test_gated_samples_close_witness_is_pre_wait_reading(monkeypatch):
    """The round-7 review reproduction: a burst contaminates sample 2,
    then drains DURING the headroom wait. The closing witness must be
    the first (pre-wait) probe — publishing the post-wait settled value
    would mark the dirty sample witness-clean."""
    base = 400.0
    # probe sequence: opening probe, then after each sample. After
    # sample 2 the first probe reads 150 (burst), the retry reads 390
    # (drained) — the settled value opens sample 3.
    # after sample 3 (the FINAL boundary) the probe is dirty too — the
    # gater must take the single pre-wait reading and NOT settle (no
    # extra probe elements exist: a settle attempt raises StopIteration)
    probes = iter([400.0,          # opening probe (clean, no wait)
                   400.0,          # after sample 1
                   150.0, 390.0,   # after sample 2: dirty, then drained
                   150.0])         # after sample 3: dirty, final — no settle
    monkeypatch.setattr(bench, "_io_calibration", lambda mb=64: next(probes))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    runs = iter([100.0, 40.0, 99.0])
    samples, opens, closes, _loads = bench._gated_warm_samples(
        lambda: next(runs), base, 3)
    assert samples == [100.0, 40.0, 99.0]
    assert closes[1] == 150.0          # pre-wait reading, NOT 390
    assert opens[2] == 390.0           # sample 3 started into drained disk
    assert closes[2] == 150.0          # final boundary: pre-wait only
    # samples 2 AND 3 are witness-dirty (3's close saw the second
    # burst): with min_clean=2 only one clean sample remains, so the
    # subset falls back to the full set and the floor gate decides
    pub, n_excl, _ok = bench._witness_clean_subset(samples, opens, closes,
                                              base, min_clean=2)
    assert pub == samples and n_excl == 0
    pub, n_excl, _ok = bench._witness_clean_subset(samples, opens, closes,
                                              base, min_clean=1)
    assert pub == [100.0] and n_excl == 2


def test_gated_samples_seed_opening_cal_skips_duplicate_probe(monkeypatch):
    """Round-7 review, second pass: the caller's _await_write_headroom
    already measured headroom right before the section — re-probing
    doubled the gate (extra waits + fsync traffic into the measured
    disk). A clean opening_cal seeds sample 0's opening witness with NO
    initial probe; a dirty one still probes."""
    base = 400.0
    # exactly n boundary probes (no opening probe must be consumed)
    probes = iter([400.0, 400.0, 400.0])
    monkeypatch.setattr(bench, "_io_calibration", lambda mb=64: next(probes))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    runs = iter([10.0, 20.0, 30.0])
    samples, opens, closes, _l = bench._gated_warm_samples(
        lambda: next(runs), base, 3, opening_cal=395.0)
    assert samples == [10.0, 20.0, 30.0]
    assert opens[0] == 395.0            # the caller's reading, verbatim

    # dirty opening_cal: the initial probe+settle still runs
    probes2 = iter([100.0, 380.0,       # opening: dirty then settled
                    400.0, 400.0, 400.0])   # boundary probes
    monkeypatch.setattr(bench, "_io_calibration",
                        lambda mb=64: next(probes2))
    runs2 = iter([10.0, 20.0, 30.0])
    _s, opens2, _c, _l2 = bench._gated_warm_samples(
        lambda: next(runs2), base, 3, opening_cal=100.0)
    assert opens2[0] == 380.0           # settled, not the dirty seed


def test_shipping_zip_is_content_keyed(tmp_path, monkeypatch):
    """Round-7 review: the pid-keyed zip name collided across container
    launches (same pid, persistent /tmp) and shipped STALE code after a
    source edit. The digest must change with any .py content change and
    be stable otherwise."""
    import os

    from flow_pipeline_spark.shipping import _pkg_digest

    pkg = tmp_path / "pkg"
    (pkg / "sub").mkdir(parents=True)
    (pkg / "a.py").write_text("x = 1\n")
    (pkg / "sub" / "b.py").write_text("y = 2\n")
    d1 = _pkg_digest(str(pkg))
    assert d1 == _pkg_digest(str(pkg))          # stable
    (pkg / "a.py").write_text("x = 999\n")
    assert _pkg_digest(str(pkg)) != d1          # content-sensitive
    # non-.py files are irrelevant to what ships
    (pkg / "notes.txt").write_text("irrelevant")
    d2 = _pkg_digest(str(pkg))
    (pkg / "notes.txt").write_text("changed")
    assert _pkg_digest(str(pkg)) == d2


def test_retry_budget_allows_then_exhausts(monkeypatch):
    """Round-8 (VERDICT r7 item #2): a dirty section's retry loop must
    grant the legacy 3 attempts unconditionally, keep granting while
    wall time spent stays under RETRY_BUDGET_SEC, and stop at the
    budget or the MAX_ATTEMPTS hard cap — the exhausted path is what
    lets a driver-run record say retries_exhausted honestly."""
    import time as _time

    import bench

    t0 = _time.monotonic()
    # first three attempts: always allowed, even with zero budget
    monkeypatch.setattr(bench, "RETRY_BUDGET_SEC", 0.0)
    assert bench._more_attempts(0, t0)
    assert bench._more_attempts(1, t0)
    assert bench._more_attempts(2, t0)
    assert not bench._more_attempts(3, t0)      # budget already spent
    # with budget remaining, attempts continue past 3...
    monkeypatch.setattr(bench, "RETRY_BUDGET_SEC", 10_000.0)
    assert bench._more_attempts(3, t0)
    assert bench._more_attempts(bench.MAX_ATTEMPTS - 1, t0)
    # ...but never past the hard cap
    assert not bench._more_attempts(bench.MAX_ATTEMPTS, t0)
    # and a section that has out-spent the budget stops at 3
    old_start = t0 - bench.RETRY_BUDGET_SEC - 1
    assert bench._more_attempts(2, old_start)
    assert not bench._more_attempts(3, old_start)
