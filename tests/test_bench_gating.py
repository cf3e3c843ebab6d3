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


def test_dispersion_verdict_thresholds():
    """Round-9 (VERDICT r8 #1): the per-query repeat-dispersion witness.
    A quiet host (all ratios near 1) is ok; a median over 1.5 or >20%
    of queries spreading past 2x refuses the clean label; one GC-pause
    outlier among many quiet queries must NOT contaminate a round."""
    import bench

    assert bench._dispersion_verdict(
        {f"q{i}": 1.1 for i in range(20)})["ok"]
    # single outlier among 20 quiet queries: still ok
    d = {f"q{i}": 1.1 for i in range(19)}
    d["gc_pause"] = 3.0
    assert bench._dispersion_verdict(d)["ok"]
    # uniformly unstable host: refused
    assert not bench._dispersion_verdict(
        {f"q{i}": 1.8 for i in range(20)})["ok"]
    # a quarter of queries spreading >2x: refused
    d = {f"q{i}": 1.2 for i in range(15)}
    d.update({f"w{i}": 2.4 for i in range(5)})
    assert not bench._dispersion_verdict(d)["ok"]
    assert bench._dispersion_verdict({})["ok"]        # empty: vacuous


def test_cpu_speed_ratio():
    import bench

    now = {"python_kops": 200.0, "gemm_gflops": 50.0,
           "pandas_groupby_mrows": 8.0}
    half = {k: v / 2 for k, v in now.items()}
    assert bench._cpu_speed_ratio(now, half) == 2.0
    assert bench._cpu_speed_ratio(now, now) == 1.0
    assert bench._cpu_speed_ratio(now, None) is None
    assert bench._cpu_speed_ratio(now, {}) is None


def test_detail_record_keeps_best_clean_at_head(tmp_path, capsys):
    """Round-9 (VERDICT r8 #3): a slower clean run at the SAME HEAD with
    the same query set must not displace a faster committed clean
    record (last-clean-wins is not curation); a new HEAD, a changed
    query set, or a missing record always refreshes; a contaminated
    run never touches the curated file."""
    import json
    import os

    import bench

    here = str(tmp_path)

    def record(head, total, contaminated=False, qs=("q1", "q2")):
        return {"queries": {q: total / len(qs) for q in qs},
                "git_head": head,
                "host": {"contaminated": contaminated}}

    fast = record("h1", 10.0)
    bench._write_detail_records(here, fast, None, contaminated=False)
    committed = bench._load_committed_detail(here)
    assert committed["git_head"] == "h1"

    # slower clean run, same HEAD, same queries: curated record kept
    slow = record("h1", 30.0)
    bench._write_detail_records(here, slow, committed, contaminated=False)
    assert bench._load_committed_detail(here)["queries"]["q1"] == 5.0
    # ...but the sidecar always has the latest run
    with open(os.path.join(here, "BENCH_DETAIL_LAST.json")) as f:
        assert json.load(f)["queries"]["q1"] == 15.0

    # faster clean run, same HEAD: refreshes
    faster = record("h1", 8.0)
    bench._write_detail_records(here, faster, committed, contaminated=False)
    assert bench._load_committed_detail(here)["queries"]["q1"] == 4.0

    # slower clean run at a NEW head: refreshes (totals not comparable)
    committed = bench._load_committed_detail(here)
    new_head = record("h2", 40.0)
    bench._write_detail_records(here, new_head, committed,
                                contaminated=False)
    assert bench._load_committed_detail(here)["git_head"] == "h2"

    # changed query set at same head: refreshes
    committed = bench._load_committed_detail(here)
    widened = record("h2", 50.0, qs=("q1", "q2", "q3"))
    bench._write_detail_records(here, widened, committed,
                                contaminated=False)
    assert "q3" in bench._load_committed_detail(here)["queries"]

    # contaminated run: curated record untouched, sidecar updated
    committed = bench._load_committed_detail(here)
    dirty = record("h3", 5.0, contaminated=True)
    bench._write_detail_records(here, dirty, committed, contaminated=True)
    assert bench._load_committed_detail(here)["git_head"] == "h2"


def test_detail_record_cross_head_cpu_normalized_curation(tmp_path):
    """Round-9 follow-up: across HEADs with the same query set, a clean
    run on a measurably slower host must not displace a faster clean
    record (normalize by the CPU ratio before comparing), while a run
    whose normalized total actually improves refreshes — and an
    out-of-range ratio (hosts too different to compare) falls back to
    recency."""
    import bench

    def record(head, total, ratio=None):
        d = {"queries": {"q1": total / 2, "q2": total / 2},
             "git_head": head, "host": {"contaminated": False}}
        if ratio is not None:
            d["host"]["cpu_speed_vs_committed"] = ratio
        return d

    here = str(tmp_path)
    bench._write_detail_records(here, record("h1", 32.6), None,
                                contaminated=False)
    committed = bench._load_committed_detail(here)

    # slower clean run, new head, 0.76x host: 47 * 0.76 = 35.7 > 32.6
    # -> committed record kept (the round-9 scenario verbatim)
    slow = record("h2", 47.0, ratio=0.76)
    bench._write_detail_records(here, slow, committed, contaminated=False)
    assert bench._load_committed_detail(here)["git_head"] == "h1"

    # same slow host but genuinely faster code: 40 * 0.76 = 30.4 < 32.6
    # -> refreshes
    faster_code = record("h3", 40.0, ratio=0.76)
    bench._write_detail_records(here, faster_code, committed,
                                contaminated=False)
    assert bench._load_committed_detail(here)["git_head"] == "h3"

    # ratio outside [0.5, 2]: not comparable -> recency wins
    committed = bench._load_committed_detail(here)
    weird = record("h4", 500.0, ratio=0.1)
    bench._write_detail_records(here, weird, committed, contaminated=False)
    assert bench._load_committed_detail(here)["git_head"] == "h4"

    # no ratio recorded (committed predates the CPU witness): recency
    committed = bench._load_committed_detail(here)
    legacy = record("h5", 600.0)
    bench._write_detail_records(here, legacy, committed,
                                contaminated=False)
    assert bench._load_committed_detail(here)["git_head"] == "h5"


def test_pick_attempt_rejects_high_dispersion_throughput_section():
    """Round-10 (VERDICT r9 item #5): the throughput sections carry the
    dispersion witness too — a fast outlier (page-cache luck) escapes
    the floor gate (median/min only looks below the median) but a
    peak/floor spread over 2x means no steady state was measured; the
    attempt must not publish as clean. A second attempt within spread
    is clean and wins."""
    base = 400.0
    flaky = {"floor_ratio": 1.3, "io_cal_after": base, "witness_ok": True,
             "dispersion": 2.6, "samples": [100.0, 130.0, 260.0]}
    steady = {"floor_ratio": 1.1, "io_cal_after": base, "witness_ok": True,
              "dispersion": 1.2, "samples": [100.0, 110.0, 120.0]}
    best, contended = bench._pick_attempt([flaky, steady], base)
    assert best is steady and contended is False
    # only the flaky attempt: publish it, but the section is contended
    best, contended = bench._pick_attempt([flaky], base)
    assert best is flaky and contended is True
    # attempts predating the witness (no dispersion key) stay clean —
    # the committed-record comparison machinery tolerates legacy shapes
    legacy = {"floor_ratio": 1.1, "io_cal_after": base, "witness_ok": True,
              "samples": [100.0]}
    assert bench._pick_attempt([legacy], base)[1] is False


def test_cpu_skew_flags_non_uniform_host_degradation():
    """Round-10 incident, reproduced verbatim: a neighbor squeeze
    collapsed the multi-threaded GEMM probe 43x while single-thread
    python bytecode ran at full speed and load1 sat at 0.02 — every
    I/O gate passed, the geomean normalizer read 0.234, and the run
    displaced the committed record (poisoning cpu_cal for every later
    comparison). The skew witness (max/min spread of the per-component
    ratios) must refuse the clean label for such a host while leaving
    uniformly slower hosts (the normalizer's actual use case) clean."""
    committed = {"python_kops": 9574.9, "gemm_gflops": 130.0,
                 "pandas_groupby_mrows": 52.7}
    squeezed = {"python_kops": 9007.7, "gemm_gflops": 3.0,
                "pandas_groupby_mrows": 31.2}
    skew = bench._cpu_skew(squeezed, committed)
    assert skew > bench.CPU_SKEW_MAX          # 40.9 on the real numbers
    # a uniformly ~0.8x host: geomean is meaningful, skew stays low
    uniform = {"python_kops": 7660.0, "gemm_gflops": 104.0,
               "pandas_groupby_mrows": 42.2}
    assert bench._cpu_skew(uniform, committed) < 1.1
    assert 0.75 < bench._cpu_speed_ratio(uniform, committed) < 0.85
    # legit cross-hardware variation (wider BLAS, slower python) stays
    # under the gate: the witness only fires on pathological spreads
    other_hw = {"python_kops": 6000.0, "gemm_gflops": 260.0,
                "pandas_groupby_mrows": 45.0}
    assert bench._cpu_skew(other_hw, committed) < bench.CPU_SKEW_MAX
    # no committed record yet -> no witness, no false contamination
    assert bench._cpu_skew(squeezed, None) is None


def test_raise_baseline_recovers_from_depressed_opening_calibration():
    """Round-10 session 3: the run-start fsync calibration read 17.7 MB/s
    (a neighbor burst) while every later probe read 170-460 — with the
    depressed baseline, every `>= baseline/2` witness gate passed
    trivially and certified nothing. The baseline must RISE when later
    calibrations exceed it >2x, and must NOT ratchet on ordinary <=2x
    fsync/page-cache variance. Round-11 (ADVICE r10): raising needs TWO
    consecutive exceedances — one transient page-cache-lucky probe must
    not latch an inflated baseline that falsely contaminates later honest
    sections — and the raised value is the MIN of the two probes."""
    r = bench._BaselineRatchet()
    # the real case: opening 17.7, later probes 451.3 then 170.0
    assert r.observe(17.7, 451.3) == 17.7      # first evidence: pending
    assert r.observe(17.7, 170.0) == 170.0     # second: raise to the min
    # normal <=2x variance never ratchets
    r = bench._BaselineRatchet()
    assert r.observe(300.0, 450.0) == 300.0
    assert r.observe(300.0, 150.0) == 300.0    # never lowers
    # a SINGLE >2x probe followed by a normal one: pending evidence is
    # cleared, the baseline stays (the ADVICE r10 page-cache-burst case)
    r = bench._BaselineRatchet()
    assert r.observe(300.0, 700.0) == 300.0    # lucky probe: pending only
    assert r.observe(300.0, 400.0) == 300.0    # cleared — no latch
    assert r.observe(300.0, 650.0) == 300.0    # non-consecutive: pending
    assert r.observe(300.0, 700.0) == 650.0    # two in a row: min raises
    # ratchet is monotone: once raised, a weaker later probe keeps it
    assert r.observe(650.0, 320.0) == 650.0


def test_cpu_skew_verdict_accepts_recovery_from_a_slow_committed_record():
    """Round-10 session 3: the recency rule committed a CLEAN record from
    a slow-but-stable host (GEMM squeezed ~5x), and the very next run —
    hardware recovered — read skew 7.5 vs that record and was falsely
    contamination-labeled. The verdict now also compares against the
    best-known clean host calibration (carried in the record's
    cpu_cal_best): uniform vs EITHER reference keeps the clean label; a
    genuinely squeezed host is non-uniform vs both and still refuses."""
    best = {"python_kops": 9574.9, "gemm_gflops": 130.0,
            "pandas_groupby_mrows": 52.7}          # r9 driver host
    slow_committed = {"python_kops": 8370.5, "gemm_gflops": 27.6,
                      "pandas_groupby_mrows": 36.7}  # session-3 record
    recovered = {"python_kops": 7906.9, "gemm_gflops": 196.8,
                 "pandas_groupby_mrows": 39.8}       # the very next run
    s_c, s_b, skewed = bench._cpu_skew_verdict(
        recovered, slow_committed, best)
    assert s_c > bench.CPU_SKEW_MAX                  # 7.5 on real numbers
    assert s_b < bench.CPU_SKEW_MAX                  # ~2.0: uniform-ish
    assert not skewed                                # clean label kept
    # a genuinely squeezed host fails against BOTH references
    squeezed = {"python_kops": 9007.7, "gemm_gflops": 3.0,
                "pandas_groupby_mrows": 31.2}
    _, _, bad = bench._cpu_skew_verdict(squeezed, slow_committed, best)
    assert bad
    # no references at all -> no witness, no false contamination
    assert bench._cpu_skew_verdict(recovered, None, None) == (
        None, None, False)


def test_promote_cal_best_requires_uniformity_vs_best():
    """Round-11 (ADVICE r10): cpu_cal_best promotion previously needed
    only a clean label and geomean > 1 — a host non-uniformly fast on
    ONE component (the observed GEMM-537.6 vs best-130 reading with
    SLOWER python) could become the skew reference and flip ordinary
    uniform hosts to 'skewed' forever after. Promotion now also gates on
    _cpu_skew(host, best) <= CPU_SKEW_MAX."""
    best = {"python_kops": 9574.9, "gemm_gflops": 130.0,
            "pandas_groupby_mrows": 52.7}
    gemm_outlier = {"python_kops": 7200.0, "gemm_gflops": 537.6,
                    "pandas_groupby_mrows": 40.0}   # geomean > 1, skew ~5.5
    assert bench._cpu_speed_ratio(gemm_outlier, best) > 1
    skew = bench._cpu_skew(gemm_outlier, best)
    # the observed incident shape sits just under/over the gate depending
    # on components; pin the behavioral contract on both sides of it
    if skew > bench.CPU_SKEW_MAX:
        assert bench._promote_cal_best(gemm_outlier, best, False) is best
    truly_skewed = {"python_kops": 7200.0, "gemm_gflops": 1300.0,
                    "pandas_groupby_mrows": 40.0}   # skew ~13
    assert bench._cpu_skew(truly_skewed, best) > bench.CPU_SKEW_MAX
    assert bench._promote_cal_best(truly_skewed, best, False) is best
    # a uniformly faster host still promotes
    faster = {"python_kops": 14000.0, "gemm_gflops": 200.0,
              "pandas_groupby_mrows": 80.0}
    assert bench._cpu_skew(faster, best) <= bench.CPU_SKEW_MAX
    assert bench._promote_cal_best(faster, best, False) is faster
    # contaminated runs never promote; no-best bootstrap unchanged
    assert bench._promote_cal_best(faster, best, True) is best
    assert bench._promote_cal_best(faster, None, False) is faster
    assert bench._promote_cal_best(faster, None, True) is None


def test_keep_committed_run_still_advances_cal_best(tmp_path):
    """Round-11 (ADVICE r10): a clean run that loses the best-clean-at-
    HEAD curation must still advance the committed record's cpu_cal_best
    (metadata-only) — otherwise the promoted best parks in the
    gitignored sidecar and the reference never moves."""
    import json as _json
    here = str(tmp_path)
    head = "abc123"
    committed = {
        "cpu_cal_best": {"python_kops": 9000.0, "gemm_gflops": 100.0,
                         "pandas_groupby_mrows": 50.0},
        "queries": {"q": 1.0}, "git_head": head,
        "host": {"contaminated": False, "cpu_cal": {}},
    }
    with open(f"{here}/BENCH_DETAIL.json", "w") as f:
        _json.dump(committed, f)
    promoted = {"python_kops": 13000.0, "gemm_gflops": 150.0,
                "pandas_groupby_mrows": 70.0}
    detail = {
        "cpu_cal_best": promoted,
        "queries": {"q": 2.0},          # slower: loses the curation
        "git_head": head,
        "host": {"contaminated": False},
    }
    bench._write_detail_records(here, detail, committed, False)
    with open(f"{here}/BENCH_DETAIL.json") as f:
        after = _json.load(f)
    # timings kept (the committed faster run), cal_best advanced
    assert after["queries"] == {"q": 1.0}
    assert after["cpu_cal_best"] == promoted
