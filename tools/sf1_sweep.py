"""Build a scaling-sweep artifact from N bench legs per scale factor.

r9 rewrite (VERDICT r8 ask #1 — the artifact-integrity fix): the r8
sweeps were assembled by hand-feeding element-wise minima of separate
legs into a tool that only read two files, with a method string that
claimed a single same-session run and normalization anchors taken from
a DIFFERENT leg than the times. This version makes the honest form the
only form the tool can emit:

- it accepts N legs per side (``--base leg1 leg2 ... --big leg1 ...``)
  and computes the per-query aggregate (min by default — wall-clock
  noise is one-sided, times only inflate) ITSELF, from the committed
  leg files, so every artifact value traces to a committed log;
- normalized times are computed PER LEG with that leg's OWN anchor
  (t/anchor), then aggregated — the anchor always matches the leg the
  time came from;
- an anchor-stability gate rejects a side whose legs' anchors spread
  more than 15% (the legs are not comparable; re-run in a quiet
  window) unless ``--allow-unstable`` records the override;
- the per-query cross-leg spread (max/min) is emitted for both sides,
  so run-to-run variance (the r8 kmeans story) is part of the artifact
  instead of a forensic reconstruction;
- the method string is GENERATED from the actual inputs (leg counts,
  aggregator, file names) — it cannot claim a protocol that didn't run;
- bench headlines carrying ``counts`` (SPARK_GRAFT_COUNTS=1, e.g.
  minhash_lsh_candidate_pairs) are copied per side and their growth
  ratio emitted — cardinalities are the noise-immune scaling signal.

exponent = log(t_big / t_base) / log(data_ratio): 1.0 = linear in data
size, < 1 sublinear (fixed overhead amortizing), > 1 superlinear (the
100 TB red flag the sweep exists to catch). Normalized variants divide
out per-leg environment speed via the ``anchor_sec`` calibration shape
first (memory: ±15-30% drift between runs in one container reads as a
phantom exponent shift of ~0.17 on a one-third-decade step).

r10 additions (VERDICT r9 ask #1 + ADVICE):

- per-query ``cpu_exponent`` from the legs' executor-CPU totals (the
  ``cpu_detail`` line bench.py emits from the UI REST stage store):
  on a fixed-core box a WALL exponent >1 with CPU exponent ≤1 is
  scheduling asymptote (idle tail waves), not per-task state growth —
  r9 could only argue this in prose; now every sweep artifact carries
  the measurement. CPU is work, not environment, so it is aggregated
  raw (min over legs — GC/JIT only ever ADD cpu) with no anchor
  normalization. ``occupancy`` (= run_sec / (wall × cores), from the
  same stage store) quantifies the idle tail directly.
- each leg's ``engine_commit`` (bench.py headline) is embedded per
  side, so an artifact can no longer silently mix engine versions the
  way the r9 sf30 artifact mixed pre-/post-fix legs; mixed commits
  within a side are refused without ``--allow-mixed-commits``.
- under ``--agg min``, unequal leg counts per side are refused without
  ``--allow-unequal-legs``: the min over more samples of one-sided
  noise is systematically lower, biasing every ratio toward the side
  with more legs.

Usage:
  python tools/sf1_sweep.py --base b1.out [b2.out ...] \\
      --big g1.out [g2.out ...] [-o out.json] [--agg min|median] \\
      [--allow-unstable] [--allow-unequal-legs] [--allow-mixed-commits]
Each input is a bench.py stdout capture; the LAST line is the headline,
and an earlier {"probe": "cpu_detail", ...} line carries per-query CPU.
"""

from __future__ import annotations

import argparse
import json
import math
import statistics
import sys
from pathlib import Path

ANCHOR_SPREAD_LIMIT = 1.15


def last_json(path: str) -> dict:
    return json.loads(Path(path).read_text().strip().splitlines()[-1])


def leg_of(path: str) -> dict:
    """Headline dict of one leg, with the cpu_detail probe line (if the
    leg has one) merged in under ``cpu`` / ``cpu_run`` / ``shuffle_write``."""
    lines = Path(path).read_text().strip().splitlines()
    leg = json.loads(lines[-1])
    for ln in lines[:-1]:
        ln = ln.strip()
        if not ln.startswith('{"probe": "cpu_detail"'):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        leg["cpu"] = d.get("cpu", {})
        leg["cpu_run"] = d.get("run", {})
        leg["shuffle_write"] = d.get("shuffle_write", {})
        leg["cpus"] = d.get("cpus")
    return leg


def _load_side(paths: list[str], label: str, allow_unstable: bool) -> dict:
    legs = [leg_of(p) for p in paths]
    sfs = {leg["sf"] for leg in legs}
    if len(sfs) != 1 or legs[0]["sf"] <= 0:
        raise SystemExit(
            f"{label}: all legs must share one known sf, got {sorted(sfs)}"
        )
    anchors = [leg.get("anchor_sec") for leg in legs]
    spread = None
    if all(anchors):
        spread = max(anchors) / min(anchors)
        if spread > ANCHOR_SPREAD_LIMIT and not allow_unstable:
            raise SystemExit(
                f"{label}: anchor spread {spread:.3f} across legs exceeds "
                f"{ANCHOR_SPREAD_LIMIT} — the legs ran in measurably "
                "different environments and their times are not "
                "comparable; re-run in one quiet window, or pass "
                "--allow-unstable to record the override in the artifact"
            )
    return {
        "paths": [Path(p).name for p in paths],
        "legs": legs,
        "sf": legs[0]["sf"],
        "anchors": anchors,
        "anchor_spread": round(spread, 3) if spread else None,
        "commits": [leg.get("engine_commit") for leg in legs],
    }


def _agg(vals: list[float], how: str) -> float:
    # median_low, not median (r12, ADVICE r11): with an even leg count an
    # interpolated median is a wall no leg actually ran, but the occupancy
    # scalar picks the single leg at order[(len-1)//2] — median_low makes
    # the aggregated wall and the occupancy describe the SAME real leg,
    # as the method string claims. Odd counts are unchanged.
    return min(vals) if how == "min" else statistics.median_low(vals)


def _per_query(side: dict, how: str) -> dict[str, dict]:
    """Per query: raw aggregate, leg-matched normalized aggregate, and
    cross-leg spread. Only queries present in EVERY leg participate."""
    legs = side["legs"]
    names = set(legs[0]["queries"])
    for leg in legs[1:]:
        names &= set(leg["queries"])
    out: dict[str, dict] = {}
    for q in sorted(names):
        raws = [leg["queries"][q] for leg in legs]
        row = {
            "sec": round(_agg(raws, how), 3),
            "legs_sec": raws,
            "spread": round(max(raws) / min(raws), 2) if min(raws) else None,
        }
        if all(side["anchors"]):
            normed = [
                t / a for t, a in zip(raws, side["anchors"], strict=True)
            ]
            row["sec_norm"] = round(_agg(normed, how), 4)
        out[q] = row
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", nargs="+", required=True)
    ap.add_argument("--big", nargs="+", required=True)
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--agg", choices=("min", "median"), default="min")
    ap.add_argument("--allow-unstable", action="store_true")
    ap.add_argument("--allow-unequal-legs", action="store_true")
    ap.add_argument("--allow-mixed-commits", action="store_true")
    ap.add_argument(
        "--protocol-note",
        default=None,
        help="runner-supplied sentence appended to the method string "
        "(e.g. the cold-cache settle protocol) so the artifact "
        "describes the protocol that actually produced its legs",
    )
    args = ap.parse_args()

    base = _load_side(args.base, "base", args.allow_unstable)
    big = _load_side(args.big, "big", args.allow_unstable)
    if base["sf"] == big["sf"]:
        raise SystemExit("base and big legs must be at distinct sfs")
    if (
        args.agg == "min"
        and len(args.base) != len(args.big)
        and not args.allow_unequal_legs
    ):
        raise SystemExit(
            f"unequal leg counts ({len(args.base)} base vs {len(args.big)} "
            "big) under min aggregation: the min over more samples of "
            "one-sided noise is systematically lower, biasing every ratio "
            "toward the side with more legs — equalize the counts, or pass "
            "--allow-unequal-legs to record the override"
        )
    for side, name in ((base, "base"), (big, "big")):
        # r11 (ADVICE): a missing engine_commit is its own sentinel, not
        # filtered out — a side mixing traced legs with pre-r10 (or
        # corrupted) untraced legs is exactly the mixed-provenance case
        # this gate exists for and must be refused, not silently passed.
        commits = {c or "unknown" for c in side["commits"]}
        if len(commits) > 1 and not args.allow_mixed_commits:
            raise SystemExit(
                f"{name} legs span multiple engine commits {sorted(commits)} "
                "— an artifact must trace to ONE engine version per side "
                "(the r9 sf30 mixed-provenance defect); rebuild from "
                "same-commit legs or pass --allow-mixed-commits"
            )
    data_ratio = big["sf"] / base["sf"]

    bq = _per_query(base, args.agg)
    gq = _per_query(big, args.agg)
    rows: dict[str, dict] = {}
    for q, b in bq.items():
        g = gq.get(q)
        if g is None:
            continue
        ratio = g["sec"] / b["sec"]
        rows[q] = {
            "base_sec": b["sec"],
            "big_sec": g["sec"],
            "base_legs_sec": b["legs_sec"],
            "big_legs_sec": g["legs_sec"],
            "base_spread": b["spread"],
            "big_spread": g["spread"],
            "ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(data_ratio), 2),
        }
        if "sec_norm" in b and "sec_norm" in g:
            rn = g["sec_norm"] / b["sec_norm"]
            rows[q]["ratio_norm"] = round(rn, 2)
            rows[q]["exponent_norm"] = round(
                math.log(rn) / math.log(data_ratio), 2
            )
        # Executor-CPU exponent + occupancy (r10, VERDICT ask #1): CPU is
        # work, aggregated raw (min over legs — noise only adds CPU), no
        # anchor normalization. occupancy = executor run-time / (wall ×
        # cores): how busy the fixed box actually was — the direct
        # idle-tail measurement behind any wall>1 / cpu≤1 reading.
        for side_label, side, srow in (
            ("base", base, b),
            ("big", big, g),
        ):
            cpus = [leg.get("cpu", {}).get(q) for leg in side["legs"]]
            runs_ = [leg.get("cpu_run", {}).get(q) for leg in side["legs"]]
            if all(c is not None for c in cpus) and cpus:
                rows[q][f"{side_label}_cpu_sec"] = round(min(cpus), 3)
            # r11 (ADVICE): occupancy is PER LEG — run_i / (wall_i ×
            # cores_i) with every factor from the SAME leg (the r10 form
            # divided a min-over-legs run by the aggregated wall and took
            # cores from leg 0 only, mixing estimators). The scalar is
            # the occupancy of the leg whose wall the aggregate selected
            # (argmin under min; the median element under median), so the
            # reported time and its busy-fraction describe one real run;
            # the full per-leg list is embedded beside it.
            walls = srow["legs_sec"]
            ncpus = [leg.get("cpus") for leg in side["legs"]]
            if all(r is not None for r in runs_) and all(ncpus) and runs_:
                occs = [
                    round(r_ / (w * n), 3)
                    for r_, w, n in zip(runs_, walls, ncpus, strict=True)
                ]
                if args.agg == "min":
                    pick = min(range(len(walls)), key=walls.__getitem__)
                else:
                    order = sorted(range(len(walls)), key=walls.__getitem__)
                    pick = order[(len(order) - 1) // 2]
                rows[q][f"{side_label}_occupancy"] = occs[pick]
                rows[q][f"{side_label}_occupancy_legs"] = occs
        if "base_cpu_sec" in rows[q] and "big_cpu_sec" in rows[q]:
            bc, gc = rows[q]["base_cpu_sec"], rows[q]["big_cpu_sec"]
            if bc > 0 and gc > 0:
                rows[q]["cpu_ratio"] = round(gc / bc, 2)
                rows[q]["cpu_exponent"] = round(
                    math.log(gc / bc) / math.log(data_ratio), 2
                )
                # r11 (VERDICT r10 ask #7): the tiny-base caveat lives in
                # the ARTIFACT, not just the README — when either side's
                # occupancy is under 5% the query's executor work is
                # sub-core-second on a 32-thread box, fixed JVM cost
                # dominates, and a cpu_exponent computed from it (e.g.
                # join_chain's 1.73 at sf0.1→sf1) measures overhead, not
                # work growth.
                occ_b = rows[q].get("base_occupancy")
                occ_g = rows[q].get("big_occupancy")
                tiny = [
                    s
                    for s, o in (("base", occ_b), ("big", occ_g))
                    if o is not None and o < 0.05
                ]
                if tiny:
                    rows[q]["cpu_exponent_caveat"] = (
                        f"tiny-base: occupancy < 0.05 on {'+'.join(tiny)} "
                        "side(s) — fixed JVM overhead dominates executor "
                        "time; exponent reflects overhead, not work growth"
                    )
    if not rows:
        raise SystemExit("no common queries across all legs")

    key = (
        "exponent_norm"
        if all("exponent_norm" in r for r in rows.values())
        else "exponent"
    )
    worst = max(rows.items(), key=lambda kv: kv[1][key])
    cpu_rows = {q: r for q, r in rows.items() if "cpu_exponent" in r}
    worst_cpu = (
        max(cpu_rows.items(), key=lambda kv: kv[1]["cpu_exponent"])
        if cpu_rows
        else None
    )

    def total(side: dict, queries: dict) -> float:
        return round(sum(r["sec"] for r in queries.values()), 3)

    counts = {}
    for label, side in (("base", base), ("big", big)):
        got = next(
            (leg["counts"] for leg in side["legs"] if leg.get("counts")),
            None,
        )
        if got:
            counts[label] = got
    count_growth = None
    if {"base", "big"} <= counts.keys():
        count_growth = {
            k: round(counts["big"][k] / counts["base"][k], 3)
            for k in counts["base"]
            if k in counts["big"]
            and isinstance(counts["base"][k], (int, float))
            and counts["base"][k]
        }

    n_b, n_g = len(base["legs"]), len(big["legs"])
    art = {
        "base_sf": base["sf"],
        "big_sf": big["sf"],
        "data_ratio": round(data_ratio, 4),
        "base_total_sec": total(base, bq),
        "big_total_sec": total(big, gq),
        "total_ratio": round(total(big, gq) / total(base, bq), 2),
        "base_legs": base["paths"],
        "big_legs": big["paths"],
        "base_anchors_sec": base["anchors"],
        "big_anchors_sec": big["anchors"],
        "base_anchor_spread": base["anchor_spread"],
        "big_anchor_spread": big["anchor_spread"],
        "base_engine_commits": base["commits"],
        "big_engine_commits": big["commits"],
        "anchor_spread_limit": ANCHOR_SPREAD_LIMIT,
        "unequal_legs_override": bool(
            args.allow_unequal_legs and len(args.base) != len(args.big)
        ),
        "anchor_unstable_override": bool(
            args.allow_unstable
            and any(
                s and s > ANCHOR_SPREAD_LIMIT
                for s in (base["anchor_spread"], big["anchor_spread"])
            )
        ),
        "worst_exponent_query": worst[0],
        "worst_exponent": worst[1][key],
        "worst_exponent_kind": key,
        **(
            {
                "worst_cpu_exponent_query": worst_cpu[0],
                "worst_cpu_exponent": worst_cpu[1]["cpu_exponent"],
            }
            if worst_cpu
            else {}
        ),
        **({"counts": counts} if counts else {}),
        **({"count_growth": count_growth} if count_growth else {}),
        "queries": rows,
        "method": (
            f"per-query {args.agg} over {n_b} base leg(s) "
            f"{base['paths']} and {n_g} big leg(s) {big['paths']}; each "
            "leg is a bench.py run (2 warmups + median-of-3 per query, "
            "noop sink, local[32]); normalized values divide each leg's "
            "times by that SAME leg's anchor_sec before aggregation; "
            "per-leg raw times and cross-leg spreads are embedded; "
            "anchor stability gated at "
            f"{ANCHOR_SPREAD_LIMIT}; per-leg engine commits embedded, "
            "one commit per side enforced; cpu_exponent from per-query "
            "executor-CPU totals (Spark UI REST stage store, min over "
            "legs, raw — CPU is work, not environment) and occupancy "
            "computed PER LEG as run_i / (wall_i x cores_i), scalar = "
            "the leg the wall aggregate selected, per-leg list "
            "embedded; big lake generated by "
            "tools/gen_sf1.py (n-replica, per-replica key offsets, "
            "cipher-rotated text, coordinate-rotated embeddings so "
            "duplicate/near-dup densities scale linearly)"
            + (f"; {args.protocol_note}" if args.protocol_note else "")
        ),
    }
    out_path = args.out or str(
        Path(__file__).resolve().parent.parent / "BENCH_sweep.json"
    )
    Path(out_path).write_text(json.dumps(art, indent=1) + "\n")
    print(
        json.dumps(
            {k: v for k, v in art.items() if k not in ("queries", "method")}
        )
    )
    for q, r in sorted(rows.items(), key=lambda kv: -kv[1][key]):
        norm = (
            f"  exp_norm={r['exponent_norm']:5.2f}"
            if "exponent_norm" in r
            else ""
        )
        cpu = (
            f"  cpu_exp={r['cpu_exponent']:5.2f}"
            f" occ={r.get('base_occupancy', 0):.2f}"
            f"->{r.get('big_occupancy', 0):.2f}"
            if "cpu_exponent" in r
            else ""
        )
        print(
            f"{q:28s} {r['base_sec']:7.3f} {r['big_sec']:8.3f}"
            f"  x{r['ratio']:5.2f}  exp={r['exponent']:5.2f}{norm}{cpu}"
            f"  spread={r['base_spread']}/{r['big_spread']}"
        )


if __name__ == "__main__":
    main()
