"""r12 driver-cost + narrow-decimal A/B probe (guide §1.1 empirical loop).

Two measurements behind one CLI, both alternating-arm in ONE session so the
numbers are comparable on a noisy box (the r12 protocol: cross-run deltas on
this container reach ±30%, in-session A/Bs are the only trusted instrument):

``--mode build``
    Plan-CONSTRUCTION time (no action executed) for every benched query,
    old arm vs new arm interleaved per rep:

    - ``legacy`` arm: ``load_table`` monkeypatched to the pre-r12 body —
      ``spark.read.parquet(path)`` on every call, i.e. a driver-side
      schema-inference/footer job per table reference per build;
    - ``memo`` arm: the shipped per-session lazy-DataFrame memo
      (catalog._DF_CACHE), which resolves repeat references from the
      session catalog the way a metastore would.

    The bench's timed window includes this construction cost (bench.py
    times ``bench_fn(spark, SF_DIR)`` together with the noop action), so
    build seconds here are real headline seconds. Guide §5: "the driver
    should do almost no data work" — repeated schema inference was
    exactly that.

``--mode dec``
    Execution A/B of pricing_summary's aggregate kernel: the shipped
    narrow-decimal shape (qty/discount sums through decimal(8,s) →
    Catalyst DecimalAggregates rewrites them to unscaled-LONG sums) vs
    the pre-r12 wide shape (all six sums through decimal(18,s) →
    Decimal128 accumulators). Arms alternate, cache cleared per rep,
    noop sink, and the two arms' RESULTS are asserted row-identical
    before any timing is reported.

``--mode chatter``
    Py4j round-trip count per query build (the targeting instrument for
    chatter reduction — see probe_chatter).

Usage:
    PYTHONPATH=. python tools/probe_driver_build.py --mode build --reps 5
    PYTHONPATH=. python tools/probe_driver_build.py --mode dec --reps 5
    PYTHONPATH=. python tools/probe_driver_build.py --mode chatter
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nhl_data_pipeline_spark import catalog
from nhl_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class _NoMemo:
    """Stand-in for catalog._DF_CACHE that always misses and never stores:
    load_table then runs its pre-r12 body (spark.read.parquet — schema
    inference/footer read — on EVERY call). Patching the cache, not the
    function, is required because every plans/ module binds ``load_table``
    by symbol at import time."""

    def setdefault(self, _spark, _default):
        return {}


def probe_build(spark, reps: int) -> dict:
    from nhl_data_pipeline_spark.plans.registry import all_queries

    specs = {n: s for n, s in all_queries().items() if s.bench}
    shipped_cache = catalog._DF_CACHE
    arms: dict[str, dict[str, list[float]]] = {
        "legacy": {n: [] for n in specs},
        "memo": {n: [] for n in specs},
    }

    def set_arm(arm: str) -> None:
        catalog._DF_CACHE = _NoMemo() if arm == "legacy" else shipped_cache

    # Warm both arms once (JIT of the Python build path itself, py4j
    # connection steady state) so rep 0 isn't a cold outlier.
    try:
        for arm in ("legacy", "memo"):
            set_arm(arm)
            for s in specs.values():
                (s.bench_fn or s.fn)(spark, SF_DIR)
        for _ in range(reps):
            for arm in ("legacy", "memo"):
                set_arm(arm)
                for name, s in specs.items():
                    t0 = time.perf_counter()
                    (s.bench_fn or s.fn)(spark, SF_DIR)
                    arms[arm][name].append(time.perf_counter() - t0)
    finally:
        catalog._DF_CACHE = shipped_cache

    def med(xs: list[float]) -> float:
        return round(sorted(xs)[len(xs) // 2], 3)

    out = {
        "probe": "driver_build_ab",
        "reps": reps,
        "build_sec_legacy": {n: med(v) for n, v in arms["legacy"].items()},
        "build_sec_memo": {n: med(v) for n, v in arms["memo"].items()},
    }
    out["total_legacy"] = round(sum(out["build_sec_legacy"].values()), 3)
    out["total_memo"] = round(sum(out["build_sec_memo"].values()), 3)
    return out


def probe_chatter(spark) -> dict:
    """Py4j round-trips per benched-query plan build (memo arm): counts
    GatewayClient.send_command calls during one construction of each
    query. The discriminator between 'build time is JVM analysis' and
    'build time is Python↔JVM chatter' — each round trip costs ~0.1-0.2 ms
    of socket latency on this box regardless of payload."""
    from py4j.java_gateway import GatewayClient

    from nhl_data_pipeline_spark.plans.registry import all_queries

    specs = {n: s for n, s in all_queries().items() if s.bench}
    counter = {"n": 0}
    orig = GatewayClient.send_command

    def counting(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    out: dict[str, int] = {}
    for s in specs.values():  # warm: analysis caches, imports
        (s.bench_fn or s.fn)(spark, SF_DIR)
    GatewayClient.send_command = counting
    try:
        for name, s in specs.items():
            counter["n"] = 0
            (s.bench_fn or s.fn)(spark, SF_DIR)
            out[name] = counter["n"]
    finally:
        GatewayClient.send_command = orig
    return {
        "probe": "build_py4j_chatter",
        "calls": out,
        "total": sum(out.values()),
    }


def probe_chatter_attr(spark) -> dict:
    """Like --mode chatter, but each py4j round trip is attributed to the
    innermost repo frame on the Python stack at call time (file:function),
    so chatter reduction targets the actual emitting site instead of a
    per-query total."""
    import traceback

    from py4j.java_gateway import GatewayClient

    from nhl_data_pipeline_spark.plans.registry import all_queries

    repo = str(Path(__file__).resolve().parent.parent)
    specs = {n: s for n, s in all_queries().items() if s.bench}
    sites: dict[str, dict[str, int]] = {}
    current: dict[str, dict[str, int]] = {}
    orig = GatewayClient.send_command

    def counting(self, *a, **kw):
        buck = current.get("b")
        if buck is not None:
            site = "?"
            for fr in reversed(traceback.extract_stack()):
                if fr.filename.startswith(repo) and "probe_driver_build" not in fr.filename:
                    site = f"{Path(fr.filename).name}:{fr.name}"
                    break
            buck[site] = buck.get(site, 0) + 1
        return orig(self, *a, **kw)

    for s in specs.values():  # warm
        (s.bench_fn or s.fn)(spark, SF_DIR)
    GatewayClient.send_command = counting
    try:
        for name, s in specs.items():
            buck: dict[str, int] = {}
            current["b"] = buck
            (s.bench_fn or s.fn)(spark, SF_DIR)
            current.pop("b")
            sites[name] = dict(
                sorted(buck.items(), key=lambda kv: -kv[1])[:12]
            )
    finally:
        GatewayClient.send_command = orig
    return {"probe": "build_py4j_chatter_attr", "sites": sites}


def probe_dec(spark, reps: int) -> dict:
    from pyspark.sql import functions as F

    from nhl_data_pipeline_spark.functions.scalars import dsum_double
    from nhl_data_pipeline_spark.plans.q_aggregates import pricing_summary

    def wide(spark, sf_dir):
        # The pre-r12 shape: every sum at decimal(18,s).
        li = catalog.load_table(spark, sf_dir, "lineitem")
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        n = F.count(F.lit(1))
        return (
            li.filter(
                F.col("l_shipdate")
                <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                dsum_double("l_quantity").alias("sum_qty"),
                dsum_double("l_extendedprice").alias("sum_base_price"),
                dsum_double(disc_price).alias("sum_disc_price"),
                dsum_double(charge, 8).alias("sum_charge"),
                (dsum_double("l_quantity") / n).alias("avg_qty"),
                (dsum_double("l_extendedprice") / n).alias("avg_price"),
                (dsum_double("l_discount", 6) / n).alias("avg_disc"),
                n.alias("count_order"),
            )
        )

    narrow = pricing_summary

    # Result equivalence first: identical rows or no timing at all.
    cols = wide(spark, SF_DIR).columns
    a = sorted(map(tuple, wide(spark, SF_DIR).collect()))
    b = sorted(map(tuple, narrow(spark, SF_DIR).collect()))
    assert a == b, "narrow-decimal arm changed pricing_summary's rows"

    walls: dict[str, list[float]] = {"wide_dec18": [], "narrow_dec8": []}
    for _ in range(reps + 1):
        for tag, fn in (("wide_dec18", wide), ("narrow_dec8", narrow)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls[tag].append(time.perf_counter() - t0)
    for tag in walls:  # drop the cold first rep of each arm
        walls[tag] = walls[tag][1:]

    def med(xs: list[float]) -> float:
        return round(sorted(xs)[len(xs) // 2], 3)

    return {
        "probe": "pricing_dec_ab",
        "reps": reps,
        "rows_equal": True,
        "n_cols": len(cols),
        "wide_dec18_sec": med(walls["wide_dec18"]),
        "narrow_dec8_sec": med(walls["narrow_dec8"]),
        "wide_reps": [round(x, 3) for x in walls["wide_dec18"]],
        "narrow_reps": [round(x, 3) for x in walls["narrow_dec8"]],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        choices=("build", "dec", "chatter", "chatter-attr"),
        required=True,
    )
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    spark = get_spark("probe_driver_build")
    if args.mode == "build":
        out = probe_build(spark, args.reps)
    elif args.mode == "chatter":
        out = probe_chatter(spark)
    elif args.mode == "chatter-attr":
        out = probe_chatter_attr(spark)
    else:
        out = probe_dec(spark, args.reps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
