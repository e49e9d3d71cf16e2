"""bench.classify_load: a contaminated run must self-identify (round-6
post-mortem — an endpoint sentinel alone missed load that RAMPED mid-sweep
and fabricated a phantom 6x regression in the driver's BENCH file)."""

from __future__ import annotations

from bench import classify_load


def test_quiesced_run_is_clean():
    state, ramped = classify_load(
        0.22, 0.24, {"q1": [0.5, 0.48, 0.52], "q2": [1.1, 1.0, 1.05]}
    )
    assert state == "quiesced"
    assert ramped == []


def test_endpoint_sentinel_flags_contamination():
    state, _ = classify_load(0.21, 0.9, {"q1": [0.5, 0.5, 0.5]})
    assert state == "CONTAMINATED"


def test_monotone_ramp_flags_suspect():
    # the round-6 signature: [1.67, 5.85, 10.18] while both sentinels read ok
    state, ramped = classify_load(
        0.22, 0.25, {"gopher": [1.67, 5.85, 10.18], "q2": [0.4, 0.39, 0.41]}
    )
    assert state == "suspect"
    assert ramped == ["gopher"]


def test_mild_monotone_jitter_not_flagged():
    # strictly increasing but <2x end-to-end: normal warmed jitter
    state, ramped = classify_load(0.2, 0.2, {"q1": [0.50, 0.55, 0.60]})
    assert state == "quiesced"
    assert ramped == []


def test_endpoint_beats_ramp_in_severity():
    state, ramped = classify_load(0.8, 0.9, {"q1": [1.0, 2.5, 4.0]})
    assert state == "CONTAMINATED"
    assert ramped == ["q1"]


# ---- round-10 additions: per-row micro-sentinel + provider/memory utils ----

def test_flag_external_names_loaded_rows():
    from bench import flag_external

    flagged = flag_external({"q1": 0.3, "q2": 8.1, "q3": 1.9, "q4": 6.0})
    assert flagged == ["q2", "q4"]


def test_flag_external_clean_run_empty():
    from bench import flag_external

    assert flag_external({"q1": 0.0, "q2": 3.9}) == []


def test_external_cpu_meter_sees_foreign_load():
    """The meter must attribute a CPU burn in ANOTHER process group to
    'external', and near-zero when the burner is inside our own group."""
    import subprocess
    import sys
    import time

    import pytest

    from bench import ExternalCpuMeter

    burner = (
        "import time\n"
        "t0 = time.time()\n"
        "while time.time() - t0 < 1.2:\n"
        "    sum(i * i for i in range(10000))\n"
    )
    # ours=False: double-fork — the intermediate exits immediately, so the
    # burner is orphaned to init and its ppid chain no longer reaches us
    # (exactly how genuinely foreign load looks); ours=True: direct
    # children, whose ppid chain does reach us.
    orphaner = (
        "import subprocess, sys\n"
        f"subprocess.Popen([sys.executable, '-c', {burner!r}],"
        " start_new_session=True)\n"
    )
    # Attribution can only be asserted against a quiet box: genuinely
    # foreign load (a concurrent sweep on a shared dev box) IS external CPU
    # and would rightly dominate both legs. Baseline-gate instead of
    # flaking: measure the box for 0.8s first and skip when it's loaded.
    probe = ExternalCpuMeter()
    t0 = time.time()
    time.sleep(0.8)
    baseline = probe.sample(time.time() - t0)
    if baseline > 2.0:
        pytest.skip(f"box carries {baseline} external cores; meter "
                    "attribution is only assertable on a quiet box")

    for ours in (False, True):
        meter = ExternalCpuMeter()
        t0 = time.time()
        code = orphaner if not ours else burner
        procs = [
            subprocess.Popen([sys.executable, "-c", code]) for _ in range(6)
        ]
        time.sleep(0.9)  # burners still alive: sample mid-burn
        ext = meter.sample(time.time() - t0)
        for p in procs:
            p.wait()
        if not ours:
            time.sleep(1.0)  # let the orphaned burners finish before next leg
            assert ext > 3.0, f"foreign 6-core burn read as {ext} cores"
        else:
            assert ext < 2.0 + baseline, (
                f"descendant burn leaked to external: {ext}"
            )


def test_resolve_state_provider_auto_and_overrides(monkeypatch):
    from fries_flink_spark.session import (
        STATE_STORE_PROVIDERS,
        resolve_state_provider,
    )

    monkeypatch.delenv("SPARK_GRAFT_STATE_PROVIDER", raising=False)
    assert (
        resolve_state_provider("/root/testdata/sf0.1")
        == STATE_STORE_PROVIDERS["hdfs"]
    )
    assert (
        resolve_state_provider("/tmp/spark_graft_scale10")
        == STATE_STORE_PROVIDERS["rocksdb"]
    )
    monkeypatch.setenv("SPARK_GRAFT_STATE_PROVIDER", "rocksdb")
    assert (
        resolve_state_provider("/root/testdata/sf0.01")
        == STATE_STORE_PROVIDERS["rocksdb"]
    )
    monkeypatch.setenv("SPARK_GRAFT_STATE_PROVIDER", "hdfs")
    assert (
        resolve_state_provider("/tmp/spark_graft_scale100")
        == STATE_STORE_PROVIDERS["hdfs"]
    )


def test_mem_gb_parse():
    from fries_flink_spark.session import _mem_gb

    assert _mem_gb("48g") == 48
    assert _mem_gb("8192m") == 8
    assert _mem_gb("512m") == 1   # floor, min 1
    assert _mem_gb("bogus") == 8  # fail-safe default
