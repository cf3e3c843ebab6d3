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
    pub, n_excl = bench._witness_clean_subset(samples, opens, closes,
                                              base, min_clean=3)
    assert pub == [100.0, 101.0, 99.0, 100.0] and n_excl == 1


def test_witness_clean_subset_falls_back_below_min_clean():
    base = 400.0
    samples = [100.0, 40.0, 42.0]
    opens = [400.0, 150.0, 150.0]
    closes = [150.0, 150.0, 150.0]
    pub, n_excl = bench._witness_clean_subset(samples, opens, closes,
                                              base, min_clean=2)
    # only 0 clean samples — publish everything, let the floor gate fail
    assert pub == samples and n_excl == 0


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
    pub, n_excl = bench._witness_clean_subset(samples, opens, closes,
                                              base, min_clean=2)
    assert pub == samples and n_excl == 0
    pub, n_excl = bench._witness_clean_subset(samples, opens, closes,
                                              base, min_clean=1)
    assert pub == [100.0] and n_excl == 2
