"""tools/sf1_sweep.py — the honest-artifact contract (r9, VERDICT r8
ask #1): values trace to the input legs, normalization is leg-matched,
anchor instability is rejected, and the method string reflects the
actual inputs. Pure driver-side tests, no Spark session."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "sf1_sweep",
    Path(__file__).resolve().parent.parent / "tools" / "sf1_sweep.py",
)
sweep = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sweep)


def _leg(path: Path, sf: float, queries: dict, anchor: float, counts=None):
    head = {
        "metric": "m",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "anchor_sec": anchor,
    }
    if counts:
        head["counts"] = counts
    path.write_text("noise line\n" + json.dumps(head) + "\n")
    return str(path)


def _run(argv, tmp_path):
    out = tmp_path / "art.json"
    sys.argv = ["sf1_sweep.py", *argv, "-o", str(out)]
    sweep.main()
    return json.loads(out.read_text())


def test_min_agg_and_leg_matched_anchors(tmp_path, capsys):
    # base legs: q takes 2.0s at anchor 1.0 and 1.8s at anchor 0.9 —
    # RAW min is 1.8 (leg 2), but NORMALIZED min is 2.0/1.0=2.0 vs
    # 1.8/0.9=2.0 — equal, proving the anchor follows its own leg.
    b1 = _leg(tmp_path / "b1.out", 1.0, {"q": 2.0}, 1.0)
    b2 = _leg(tmp_path / "b2.out", 1.0, {"q": 1.8}, 0.9)
    g1 = _leg(tmp_path / "g1.out", 10.0, {"q": 20.0}, 1.0)
    g2 = _leg(tmp_path / "g2.out", 10.0, {"q": 30.0}, 1.0)
    art = _run(["--base", b1, b2, "--big", g1, g2], tmp_path)
    row = art["queries"]["q"]
    assert row["base_sec"] == 1.8 and row["big_sec"] == 20.0
    assert row["base_legs_sec"] == [2.0, 1.8]
    assert row["big_spread"] == 1.5  # 30/20 — variance is IN the artifact
    # norm: base min(2.0/1.0, 1.8/0.9)=2.0; big min(20,30)/1.0=20 →
    # ratio_norm 10 → exponent_norm 1.0 exactly.
    assert row["ratio_norm"] == 10.0 and row["exponent_norm"] == 1.0
    # raw: 20/1.8 = 11.11 → exponent log(11.11)/log(10) ≈ 1.05
    assert row["exponent"] == 1.05
    assert art["worst_exponent_kind"] == "exponent_norm"
    # method string names the real protocol, not a fictional one
    assert "2 base leg(s)" in art["method"] and "min" in art["method"]
    assert "b1.out" in art["method"]


def test_anchor_stability_gate(tmp_path):
    b1 = _leg(tmp_path / "b1.out", 1.0, {"q": 2.0}, 1.0)
    b2 = _leg(tmp_path / "b2.out", 1.0, {"q": 2.0}, 1.3)  # 30% apart
    g1 = _leg(tmp_path / "g1.out", 10.0, {"q": 20.0}, 1.0)
    g2 = _leg(tmp_path / "g2.out", 10.0, {"q": 20.0}, 1.0)
    with pytest.raises(SystemExit, match="anchor spread"):
        _run(["--base", b1, b2, "--big", g1, g2], tmp_path)
    art = _run(
        ["--base", b1, b2, "--big", g1, g2, "--allow-unstable"], tmp_path
    )
    assert art["anchor_unstable_override"] is True
    assert art["base_anchor_spread"] == 1.3


def test_unequal_leg_counts_refused_under_min(tmp_path):
    """r10 (ADVICE): min over more samples of one-sided noise is
    systematically lower — unequal per-side leg counts bias the ratio,
    so the tool refuses them under --agg min without the override."""
    b1 = _leg(tmp_path / "b1.out", 1.0, {"q": 2.0}, 1.0)
    b2 = _leg(tmp_path / "b2.out", 1.0, {"q": 2.1}, 1.0)
    g1 = _leg(tmp_path / "g1.out", 10.0, {"q": 20.0}, 1.0)
    with pytest.raises(SystemExit, match="unequal leg counts"):
        _run(["--base", b1, b2, "--big", g1], tmp_path)
    art = _run(
        ["--base", b1, b2, "--big", g1, "--allow-unequal-legs"], tmp_path
    )
    assert art["unequal_legs_override"] is True
    # median aggregation is count-symmetric: no refusal
    art = _run(
        ["--base", b1, b2, "--big", g1, "--agg", "median"], tmp_path
    )
    assert art["unequal_legs_override"] is False


def test_mixed_sf_rejected_and_counts_growth(tmp_path):
    b1 = _leg(
        tmp_path / "b1.out", 1.0, {"q": 2.0}, 1.0,
        counts={"minhash_lsh_candidate_pairs": 100.0},
    )
    g1 = _leg(
        tmp_path / "g1.out", 3.0, {"q": 5.0}, 1.0,
        counts={"minhash_lsh_candidate_pairs": 310.0},
    )
    art = _run(["--base", b1, "--big", g1], tmp_path)
    assert art["count_growth"]["minhash_lsh_candidate_pairs"] == 3.1
    bad = _leg(tmp_path / "bad.out", 3.0, {"q": 2.0}, 1.0)
    with pytest.raises(SystemExit, match="one known sf"):
        _run(["--base", b1, bad, "--big", g1], tmp_path)
    with pytest.raises(SystemExit, match="distinct sfs"):
        _run(["--base", b1, "--big", b1], tmp_path)


def test_median_agg(tmp_path):
    legs = [
        _leg(tmp_path / f"b{i}.out", 1.0, {"q": t}, 1.0)
        for i, t in enumerate([1.0, 3.0, 2.0])
    ]
    g = _leg(tmp_path / "g.out", 10.0, {"q": 20.0}, 1.0)
    art = _run(["--base", *legs, "--big", g, "--agg", "median"], tmp_path)
    assert art["queries"]["q"]["base_sec"] == 2.0
    assert "median over" in art["method"].replace(
        "per-query median", "median"
    )


def _leg_cpu(path: Path, sf, queries, anchor, cpu, run, commit="abc1234"):
    head = {
        "metric": "m",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "anchor_sec": anchor,
        "engine_commit": commit,
    }
    detail = {
        "probe": "cpu_detail",
        "cpu": cpu,
        "cpu_reps": {k: [v] for k, v in cpu.items()},
        "run": run,
        "shuffle_write": {k: 0.0 for k in cpu},
        "cpus": 32,
    }
    path.write_text(json.dumps(detail) + "\n" + json.dumps(head) + "\n")
    return str(path)


def test_cpu_exponent_and_occupancy(tmp_path):
    """r10 (VERDICT r9 ask #1): per-query executor-CPU totals from the
    legs' cpu_detail lines become cpu_exponent + occupancy in the
    artifact — the committed form of the 'wall-only, CPU sublinear'
    argument."""
    # wall grows 4x at 2x data (exponent 2) but CPU only 2x (cpu_exp 1):
    # the fixed-box idle-tail signature; occupancy halves.
    b = _leg_cpu(
        tmp_path / "b.out", 1.0, {"q": 2.0}, 1.0, {"q": 32.0}, {"q": 48.0}
    )
    g = _leg_cpu(
        tmp_path / "g.out", 2.0, {"q": 8.0}, 1.0, {"q": 64.0}, {"q": 96.0}
    )
    art = _run(["--base", b, "--big", g], tmp_path)
    row = art["queries"]["q"]
    assert row["exponent"] == 2.0
    assert row["base_cpu_sec"] == 32.0 and row["big_cpu_sec"] == 64.0
    assert row["cpu_ratio"] == 2.0 and row["cpu_exponent"] == 1.0
    # occupancy = run / (wall * 32): 48/(2*32)=0.75 -> 96/(8*32)=0.375
    assert row["base_occupancy"] == 0.75
    assert row["big_occupancy"] == 0.375
    assert art["worst_cpu_exponent_query"] == "q"
    assert art["worst_cpu_exponent"] == 1.0
    assert art["base_engine_commits"] == ["abc1234"]
    assert "cpu_exponent" in art["method"]


def test_mixed_engine_commits_refused(tmp_path):
    """r10 (ADVICE): an artifact side must trace to ONE engine version —
    the r9 sf30 artifact silently mixed pre-/post-fix legs."""
    b1 = _leg_cpu(
        tmp_path / "b1.out", 1.0, {"q": 2.0}, 1.0, {"q": 1.0}, {"q": 1.0},
        commit="aaa1111",
    )
    b2 = _leg_cpu(
        tmp_path / "b2.out", 1.0, {"q": 2.0}, 1.0, {"q": 1.0}, {"q": 1.0},
        commit="bbb2222",
    )
    g1 = _leg_cpu(
        tmp_path / "g1.out", 10.0, {"q": 20.0}, 1.0, {"q": 10.0}, {"q": 10.0}
    )
    g2 = _leg_cpu(
        tmp_path / "g2.out", 10.0, {"q": 20.0}, 1.0, {"q": 10.0}, {"q": 10.0}
    )
    with pytest.raises(SystemExit, match="multiple engine commits"):
        _run(["--base", b1, b2, "--big", g1, g2], tmp_path)
    art = _run(
        ["--base", b1, b2, "--big", g1, g2, "--allow-mixed-commits"],
        tmp_path,
    )
    assert sorted(art["base_engine_commits"]) == ["aaa1111", "bbb2222"]
