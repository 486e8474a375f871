"""Probe exponent gates are calibrated to 32 cores (r13, VERDICT r12
ask #3): at lower core counts the x100 leg under-saturates the box and
fixed costs amortize differently, so the 0.95 ceiling misfires with no
per-row growth (the r12 8-core driver leg read staging 1.035 on an
engine that reads 0.455 at 32). Off the calibrated width bench.py
records the exponent instead of asserting it."""

from __future__ import annotations

from types import SimpleNamespace

from bench import _gate_calibrated


def _fake_spark(par: int):
    return SimpleNamespace(sparkContext=SimpleNamespace(defaultParallelism=par))


def test_gate_asserts_at_calibrated_width():
    assert _gate_calibrated(_fake_spark(32))
    assert _gate_calibrated(_fake_spark(64))


def test_gate_records_only_below_calibrated_width():
    assert not _gate_calibrated(_fake_spark(8))
    assert not _gate_calibrated(_fake_spark(16))
