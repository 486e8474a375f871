"""bench.py's _StageMeter contract (r10, VERDICT r9 ask #1).

The meter is the source of every cpu_exponent in the sweep artifacts,
so its failure modes are pinned: with the UI off (every non-bench
session, session.py policy) it must disable itself and return inert
values — a caller must never mistake "no UI" for "zero CPU" — and the
sweep tool's leg parser must pass cpu through only when a cpu_detail
line exists (covered in tests/test_sweep_tool.py). The enabled path is
exercised end-to-end by every bench leg (cpu_detail line + nonzero
totals asserted against wall in the committed legs), which a unit test
cannot reproduce without binding the UI port inside pytest.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_stage_meter_disabled_without_ui(spark):
    # The pytest session runs with spark.ui.enabled=false (session.py):
    # uiWebUrl is None, so the meter must report disabled and inert.
    assert spark.sparkContext.uiWebUrl is None
    m = bench._StageMeter(spark)
    assert m.enabled is False
    assert m.snap() == -1
    assert m.since(-1) is None


def test_committed_legs_carry_consistent_cpu_detail():
    """Every committed r10 leg's cpu_detail line is internally
    consistent: cpu min equals min of its reps, and executor CPU never
    exceeds run-time (run includes GC + fetch wait on top of CPU)."""
    import json

    legs = sorted(
        (Path(__file__).resolve().parent.parent / "bench_logs" / "r10").glob(
            "bench_r10_*_leg*.out"
        )
    )
    assert legs, "r10 legs missing"
    checked = 0
    for leg in legs:
        lines = leg.read_text().strip().splitlines()
        detail = [l for l in lines if l.startswith('{"probe": "cpu_detail"')]
        if not detail:
            continue
        d = json.loads(detail[-1])
        for q, v in d["cpu"].items():
            assert v == min(d["cpu_reps"][q]), (leg.name, q)
            assert 0 < v <= d["run"][q] * 1.05, (leg.name, q, v, d["run"][q])
        checked += 1
    assert checked >= 10  # 3x sf10 + 3x sf30 + 4 subset legs minimum
