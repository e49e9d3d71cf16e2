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
