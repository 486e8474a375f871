"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Output contract (round 6 — the r5 driver artifact was truncated because
everything lived on one 2,935-char line and the driver keeps only a
~2,000-char tail): each scale PROBE prints as its own earlier stdout line
(`{"probe": "<name>", ...}`) AND the full probe set is written to
``BENCH_probes.json`` next to this file; the compact headline JSON —

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <scale factor>}

— is the FINAL stdout line (~700 chars), so the driver's tail always
contains it. A probe that throws records {"error": ...} instead of
killing the run; probes never touch the headline line.

Each query is materialized through the noop sink (full computation incl.
shuffles/windows, no driver collect). A warmup query first touches every
input table so JIT/codegen and file-footer caching don't pollute the first
measurement. Set SPARK_GRAFT_SKIP_PROBES=1 to run only the headline loop
(fast local iteration).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nhl_data_pipeline_spark.catalog import TABLES, load_table
from nhl_data_pipeline_spark.plans.registry import all_queries
from nhl_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _git_commit() -> str:
    """Engine commit of the running tree — embedded in every leg headline
    so sweep artifacts are traceable to ONE engine version per leg (r10,
    ADVICE: the r9 sf30 artifact silently mixed pre- and post-fix legs)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=Path(__file__).resolve().parent,
            timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001
        return "unknown"


class _StageMeter:
    """Per-query executor CPU / run time / shuffle-write totals from the
    Spark UI REST API (stage-level StageData), r10 VERDICT ask #1: the
    sf30 "wall-only, CPU is sublinear" defense existed only in prose —
    this meter makes executor CPU a first-class per-leg measurement so
    sweep artifacts can emit ``cpu_exponent`` beside ``exponent_norm``.

    Mechanics: ``snap()`` returns the highest completed stageId after
    draining the listener bus; ``since(mark)`` sums ``executorCpuTime``
    (ns), ``executorRunTime`` (ms) and ``shuffleWriteBytes`` over the
    completed stages that appeared after the mark. Marker-based deltas
    (not cumulative totals) stay correct when the UI evicts OLD stages;
    bench sessions also raise ``spark.ui.retainedStages`` so eviction
    never bites mid-query. Disabled automatically when the UI is off
    (``uiWebUrl`` is None) — every caller must tolerate None deltas.
    """

    def __init__(self, spark) -> None:
        self._spark = spark
        url = spark.sparkContext.uiWebUrl
        self.enabled = bool(url)
        if self.enabled:
            self._base = (
                f"{url}/api/v1/applications/"
                f"{spark.sparkContext.applicationId}"
            )

    def _drain(self) -> None:
        # The status store is fed asynchronously by the listener bus;
        # without a drain the just-finished stages may not be visible.
        # listenerBus is private[spark] — bytecode-public, callable via
        # py4j; fall back to a fixed sleep if the API moves.
        try:
            self._spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(
                10_000
            )
        except Exception:  # noqa: BLE001
            time.sleep(0.5)

    def _stages(self) -> list[dict] | None:
        """Completed StageData rows, or None when the REST read fails.

        r11 (ADVICE): the read is guarded HERE, not in callers' per-query
        try blocks — a transient UI hiccup (port reset, URLError, slow
        listener) must degrade to "no CPU detail for this query", never
        masquerade as a query failure: the query's wall time is real and
        must stay out of the slow-penalty path.
        """
        import urllib.request

        try:
            with urllib.request.urlopen(
                self._base + "/stages?status=complete", timeout=30
            ) as r:
                return json.loads(r.read())
        except Exception:  # noqa: BLE001 — REST failure ≠ query failure
            return None

    def snap(self) -> int | None:
        """Highest completed stageId; -1 when disabled or the store is
        empty; None when the REST read failed (distinct from -1 so a
        failed snapshot can never become since(-1) = "sum all history")."""
        if not self.enabled:
            return -1
        self._drain()
        stages = self._stages()
        if stages is None:
            return None
        return max((s["stageId"] for s in stages), default=-1)

    def since(self, mark: int | None) -> dict | None:
        if not self.enabled or mark is None:
            return None
        self._drain()
        stages = self._stages()
        if stages is None:
            return None
        new = [s for s in stages if s["stageId"] > mark]
        return {
            "cpu_sec": sum(s.get("executorCpuTime", 0) for s in new) / 1e9,
            "run_sec": sum(s.get("executorRunTime", 0) for s in new) / 1e3,
            "shuffle_write_bytes": float(
                sum(s.get("shuffleWriteBytes", 0) for s in new)
            ),
        }


def _sf_from_dir(d: str) -> float:
    name = Path(d).name  # e.g. sf0.1
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        return -1.0


def _calibration_anchor(spark) -> float:
    """Fixed, data-independent CPU-bound micro-op, reported as the MIN
    of 5 runs (r9; was 2-warmup median-of-3).

    Why min: r9's back-to-back sweep legs measured the median-of-3
    anchor 25% apart (1.039 vs 0.832) while the same legs' QUERY totals
    agreed to 3.6% — the ~1 s anchor op is noisier than what it
    normalizes, so dividing by it injects up to log(1.25)/log(3.33) ≈
    0.19 of phantom exponent. Wall-clock noise on a fixed op is
    one-sided (runs only ever get slower), so the min over 5 is the
    robust estimator of the op's true cost — and it subsumes warmup
    slicing, since cold runs are never the min.

    Purpose: cross-ENVIRONMENT normalization. Identical pinned plans have
    measured 1.5-1.7× apart between the driver's bench env and same-day
    local runs (r6: 25.88 vs 16.58 s, uniform across all queries), and
    ±15-30% between runs in one booted container — without a
    data-independent anchor those gaps can only be argued, not divided
    out. normalized_total = total / (anchor / reference_anchor).

    The op: 2^24 rows → md5(id) → substring group key → hash-agg with a
    count and a decimal-exact sum. Exercises exactly this engine's hot
    mix (string/hash codegen + shuffle hash aggregation + decimal sums),
    touches no input table, and its plan cannot drift with data.
    """
    from pyspark.sql import functions as F

    def once() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        (
            spark.range(0, 1 << 24, 1, 32)
            .select(F.md5(F.col("id").cast("string")).alias("h"), "id")
            .groupBy(F.substring("h", 1, 4).alias("k"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("id").cast("decimal(18,0)")).alias("s"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    return round(min(once() for _ in range(5)), 3)


def _calibration_anchors(spark) -> dict[str, float]:
    """THREE fixed, data-independent anchor shapes (r8, VERDICT ask #3).

    The r7 single CPU anchor over-corrected across hosts: driver/local
    anchor ratio 1.48× vs a bench-total ratio of 1.19× — normalizing the
    driver total by it yielded a driver time FASTER than local, which is
    impossible. The environment gap evidently does not live uniformly in
    JVM-CPU speed, so one shape cannot transfer. Emitting one anchor per
    execution COMPONENT lets a reader attribute the gap instead:

    - ``anchor_sec``      — JVM codegen + hash-agg (the r7 shape, kept
      under its old key so sweep tooling and round-over-round
      comparisons parse unchanged);
    - ``anchor_shuffle_sec`` — a fixed 2^22-row round-trip through a
      hash-partitioned exchange (shuffle write + fetch + read path:
      serialization, disk, scheduler);
    - ``anchor_arrow_sec``   — a 2^21-row mapInPandas round-trip
      (Python worker launch/reuse + Arrow (de)serialization — the
      component that prices every applyInPandas/mapInPandas stage).

    Estimator: min of 5 runs (see _calibration_anchor).
    Cross-ENV normalization claims are scoped to same-host legs (the
    sweep's use); cross-host comparisons should quote per-component
    ratios, not divide by any single shape.
    """
    from pyspark.sql import functions as F

    def timed(build) -> float:
        def once() -> float:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # min of 5, same one-sided-noise reasoning as _calibration_anchor.
        return round(min(once() for _ in range(5)), 3)

    def shuffle_shape():
        # repartition on a computed key: a real map→exchange→reduce round
        # trip of 4M narrow rows; the post-shuffle projection keeps the
        # read side from being optimized into the noop sink.
        return (
            spark.range(0, 1 << 22, 1, 32)
            .repartition(64, (F.col("id") % 9973).alias("k"))
            .select((F.col("id") + 1).alias("v"))
        )

    def arrow_shape():
        def roundtrip(batches):
            for pdf in batches:
                pdf["v"] = pdf["id"] * 2 + 1
                yield pdf[["v"]]

        return spark.range(0, 1 << 21, 1, 32).mapInPandas(
            roundtrip, "v long"
        )

    return {
        "anchor_sec": _calibration_anchor(spark),
        "anchor_shuffle_sec": timed(shuffle_shape),
        "anchor_arrow_sec": timed(arrow_shape),
    }


def main() -> None:
    # UI on for bench runs (off everywhere else, session.py): the REST
    # status API is the source of the per-query executor-CPU totals that
    # back every scale claim (VERDICT r9 ask #1). Launch-time conf —
    # bench owns the first session in its process. Retention raised so
    # marker-based deltas never lose an un-read stage; task rows capped
    # (stage SUMMARIES carry the metrics this needs).
    cpu_on = os.environ.get("SPARK_GRAFT_CPU", "1") == "1"
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
            "spark.ui.retainedTasks": "100",
        }
        if cpu_on
        else None,
    )
    meter = _StageMeter(spark)
    specs = {n: s for n, s in all_queries().items() if s.bench}
    # Targeted sweeps (e.g. the sf3 second-decade exponent runs) time a
    # subset without perturbing the full-headline artifact contract:
    # SPARK_GRAFT_ONLY="q1,q2" filters the benched set; the output line
    # keeps the same shape so sweep tooling parses it unchanged.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        unknown = names - specs.keys()
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_ONLY names not benched: {unknown}")
        specs = {n: s for n, s in specs.items() if n in names}

    # Warmup: touch every table (footer reads), then run each headline
    # query once AT THE TARGET SF. Warming at a smaller sf is not enough:
    # AQE picks different runtime join strategies by actual size (everything
    # broadcasts at sf0.001; the big joins stay sort-merge at sf0.1), so the
    # small-sf warmup compiles the wrong whole-stage code and the first
    # target-sf run pays ~0.5-2s of codegen/JIT per query (verified by
    # repeat-run profiling). Warming at the target compiles every runtime
    # plan variant the timed runs will execute.
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()
    # Calibration anchor FIRST (before query JIT state accumulates): a
    # fixed CPU-bound micro-op whose time depends only on the
    # environment, emitted in the headline JSON so cross-env /
    # cross-round totals can be normalized by the anchor ratio.
    anchors = _calibration_anchors(spark)
    print(json.dumps({"probe": "calibration_anchor", **anchors}))
    sys.stdout.flush()
    # Per-query measurement blocks: 2 warmup runs, then the MEDIAN of 3
    # timed runs. Earlier rounds warmed every query once and then timed
    # each once in sequence — but tools/bench_probe.py shows per-plan
    # steady state needs consecutive executions of the SAME plan (HotSpot
    # promotes the generated classes to C2 after enough invocations; a
    # query timed 10 queries after its warmup reads ~2× its repeat-run
    # time, and the number depended on loop ORDER). Blocked warmup + median
    # makes each number the query's own steady state, independent of its
    # neighbors. clearCache before every run: persisted intermediates are
    # recomputed inside the measurement — only JIT/codegen state stays
    # warm, never data.
    timings: dict[str, float] = {}
    # Per-rep times (r9, VERDICT ask #6): the headline keeps the median,
    # but the artifact now carries every timed rep — run-to-run spread is
    # the kmeans-variance signal, and the sweep tool emits max/min per
    # query from these instead of anyone stitching legs by hand.
    reps: dict[str, list[float]] = {}
    # Per-query executor CPU / run-time / shuffle-write (r10, VERDICT
    # ask #1): CPU is the work signal wall-clock can't give on a fixed
    # box — a wall exponent >1 with CPU exponent ≤1 is scheduling
    # asymptote, not per-task state growth. min over the timed reps,
    # same one-sided-noise estimator as the anchors (GC/JIT only ADD
    # cpu). The meter reads OUTSIDE the timed window (snap before t0,
    # since() after the clock stops), so wall numbers are unaffected.
    cpu_min: dict[str, float] = {}
    cpu_reps: dict[str, list[float]] = {}
    run_min: dict[str, float] = {}
    shuf_w: dict[str, float] = {}
    from nhl_data_pipeline_spark.catalog import reset_scan_splits

    for name, spec in specs.items():
        runs: list[float] = []
        deltas: list[dict] = []
        # Execution-order independence (VERDICT r9 "what's wrong" #2):
        # every query block starts from the default scan-split size, so
        # an untuned query never inherits the previous query's tuning.
        reset_scan_splits(spark)
        try:
            bench_fn = spec.bench_fn or spec.fn
            for i in range(5):
                spark.catalog.clearCache()
                mark = meter.snap() if i >= 2 else -1
                t0 = time.perf_counter()
                bench_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                if i >= 2:
                    runs.append(time.perf_counter() - t0)
                    d = meter.since(mark)
                    if d is not None:
                        deltas.append(d)
        except Exception as exc:  # noqa: BLE001
            # Surface it loudly AND penalize: a broken query must read as
            # SLOW in the summed headline (a negative marker would make
            # the total smaller — a regression disguised as a speedup).
            print(f"WARNING: bench run failed for {name}: {exc!r}", file=sys.stderr)
            timings[name] = 999.0
            continue
        reps[name] = [round(r, 3) for r in runs]
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        if deltas:
            cpu_reps[name] = [round(d["cpu_sec"], 3) for d in deltas]
            cpu_min[name] = min(cpu_reps[name])
            run_min[name] = round(min(d["run_sec"] for d in deltas), 3)
            shuf_w[name] = min(d["shuffle_write_bytes"] for d in deltas)

    # Deterministic scale counts (r9, VERDICT ask #3): candidate-pair
    # cardinalities are the noise-immune scaling signal (the r8 jaccard
    # diagnosis worked exactly this way) — SPARK_GRAFT_COUNTS=1 records
    # them in the headline so sweep artifacts carry counts alongside
    # times. Off by default: the count jobs would perturb the driver's
    # timed environment for no benefit at sf0.1.
    counts: dict[str, float | str] = {}
    if os.environ.get("SPARK_GRAFT_COUNTS") == "1":
        try:
            from nhl_data_pipeline_spark.plans.q_text import (
                _minhash_lsh_pure,
            )

            spark.catalog.clearCache()
            counts["minhash_lsh_candidate_pairs"] = float(
                _minhash_lsh_pure(spark, SF_DIR).count()
            )
        except Exception as exc:  # noqa: BLE001
            counts["error"] = repr(exc)[:200]

    # CPU detail on its OWN penultimate-ish stdout line: the headline
    # line must stay well under the driver's ~2,000-char tail window
    # (the r5 truncation lesson), and sweep tooling reads full leg
    # captures, so the per-query CPU block lives here and the sweep
    # tool picks it up by its "probe" key.
    if cpu_min:
        print(
            json.dumps(
                {
                    "probe": "cpu_detail",
                    "cpu": cpu_min,
                    "cpu_reps": cpu_reps,
                    "run": run_min,
                    "shuffle_write": shuf_w,
                    "cpus": spark.sparkContext.defaultParallelism,
                }
            )
        )
        sys.stdout.flush()

    # Probes: each on its own EARLY stdout line + all collected into
    # BENCH_probes.json. A probe failure is recorded, never fatal — the
    # headline line below must always be the last thing on stdout.
    probes: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_SKIP_PROBES") != "1":
        for pname, pfn in (
            ("dedup_scale_probe", _dedup_scale_probe),
            ("ann_scale_probe", _ann_scale_probe),
            ("bloom_prejoin_probe", _bloom_prejoin_probe),
            ("cc_skew_probe", _cc_skew_probe),
            ("skew_join_probe", _skew_join_probe),
            ("streaming_throughput_probe", _streaming_throughput_probe),
            ("partition_sizing_probe", _partition_sizing_probe),
            ("pipeline_e2e_probe", _pipeline_e2e_probe),
            ("pipeline_scale_probe", _pipeline_scale_probe),
        ):
            try:
                probes[pname] = pfn(spark)
            except Exception as exc:  # noqa: BLE001
                probes[pname] = {"error": repr(exc)[:400]}
            print(json.dumps({"probe": pname, **probes[pname]}))
            sys.stdout.flush()
        # File write only on explicit request (r10, VERDICT housekeeping):
        # driver runs were rewriting this tracked file on every round,
        # leaving the end-of-round tree dirty. The probe VALUES still hit
        # stdout above either way.
        if os.environ.get("SPARK_GRAFT_PROBES_OUT") == "1":
            probe_path = Path(__file__).resolve().parent / "BENCH_probes.json"
            probe_path.write_text(
                json.dumps(
                    {"sf": _sf_from_dir(SF_DIR), "probes": probes}, indent=1
                )
                + "\n"
            )

    # Headline JSON: compact, LAST stdout line — the driver's artifact.
    print(
        json.dumps(
            {
                "metric": "sum of headline query wall-clock (noop sink)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "runs": reps,
                **({"counts": counts} if counts else {}),
                "sf": _sf_from_dir(SF_DIR),
                **anchors,
                "engine_commit": _git_commit(),
                "cpus": spark.sparkContext.defaultParallelism,
            }
        )
    )


def _gate_calibrated(spark) -> bool:
    """True when the probe exponent gates' 0.95 ceilings apply: they were
    measured/calibrated at 32 cores (r7-r10). The driver's lower-core
    bench leg still runs the probes and records the exponents, but a
    fixed-cost-amortization artifact at 8 cores must not read as a
    structural regression (r12's 8-core leg: staging 1.035 with the
    identical engine that reads 0.455 at 32)."""
    return spark.sparkContext.defaultParallelism >= 32


def _parse_size_bytes(raw: str) -> int | None:
    """First 'N unit' size in a metric display string, in bytes."""
    import re as _re

    m = _re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB)", raw)
    if not m:
        return None
    mult = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30}
    return int(float(m.group(1)) * mult[m.group(2)])


def _iter_exec_metrics(store, first_idx: int):
    """Yield (metric_name, raw_display_string) for every metric of every
    SQL execution from ``first_idx`` onward — the single status-store
    walk shared by the shuffle and spill probes (the store is the UI's
    source of truth; the AQE plan's node.metrics() reads zeros)."""
    execs = store.executionsList()
    for i in range(first_idx, execs.length()):
        ex = execs.apply(i)
        vals = store.executionMetrics(ex.executionId())
        mdefs = ex.metrics()
        for j in range(mdefs.length()):
            md = mdefs.apply(j)
            if vals.contains(md.accumulatorId()):
                yield md.name(), str(vals.apply(md.accumulatorId()))


def _query_shuffle_metrics(spark, run) -> dict[str, int]:
    """Execute ``run()`` and return the MAX per-exchange shuffle records +
    bytes written of the resulting SQL execution, read from Spark's
    SQLAppStatusStore. Max-per-exchange isolates the dominant
    (fact-side) exchange — the one the bloom filter is supposed to
    shrink."""
    import time as _t

    store = spark._jsparkSession.sharedState().statusStore()
    before = store.executionsList().length()
    run()
    _t.sleep(1.0)  # listener bus drain
    records, bytes_ = 0, 0
    for name, raw in _iter_exec_metrics(store, before):
        if name == "shuffle records written":
            records = max(records, int(raw.replace(",", "")))
        elif name == "shuffle bytes written":
            b = _parse_size_bytes(raw)
            if b is not None:
                bytes_ = max(bytes_, b)
    return {"records": records, "bytes": bytes_}


def _bloom_prejoin_probe(spark) -> dict:
    """Measured exchange reduction from bloom join pre-pruning
    (operators/bloom.py): a selective dim join at the bench SF with
    broadcast DISABLED (the regime where the fact side genuinely
    shuffles — the 100 TB shape). Records the fact-side exchange's
    rows/bytes for the plain join vs the bloom-pruned join, plus the
    filter's measured false-positive rate ε (surviving non-matches /
    eligible non-matches)."""
    from pyspark.sql import functions as F

    from nhl_data_pipeline_spark.operators.bloom import bloom_prejoin

    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_nationkey") == 3
    )

    def joined(big):
        return big.join(cust, big.o_custkey == cust.c_custkey).select(
            "o_orderkey", "o_totalprice"
        )

    out: dict[str, float] = {}
    rows_pre = orders.count()
    true_rows = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_semi",
    ).count()
    pruned = bloom_prejoin(orders, "o_custkey", cust, "c_custkey")
    rows_post = pruned.count()
    out["rows_pre"] = float(rows_pre)
    out["rows_post"] = float(rows_post)
    out["rows_true_match"] = float(true_rows)
    denom = rows_pre - true_rows
    out["epsilon_measured"] = (
        round((rows_post - true_rows) / denom, 6) if denom else 0.0
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for label, big in (("plain", orders), ("bloom", pruned)):
            t0 = time.perf_counter()
            m = _query_shuffle_metrics(
                spark,
                lambda: joined(big)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
            out[f"{label}_join_sec"] = round(time.perf_counter() - t0, 3)
            out[f"{label}_exchange_records"] = float(m["records"])
            out[f"{label}_exchange_bytes"] = float(m["bytes"])
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    return out


def _cc_skew_probe(spark) -> dict:
    """Adversarial-topology probe for the two connected-components
    implementations (operators/cluster.py): a mega-component holding 50%
    of all nodes behind one 100K-degree hub (per-round join skew), and
    long chains (the O(diameter)-rounds regime where min-label
    propagation degrades and large-star/small-star's O(log n) bound
    matters). rounds = -1 marks a deliberate DNF at the stated cap.
    Documented default: label-prop for near-dup graphs (shallow, dense —
    hub-like), star for unknown/chain-heavy topology."""
    from nhl_data_pipeline_spark.operators import cluster as CC

    out: dict[str, float] = {}

    def run(tag, edges, fn, expect_components, max_rounds):
        stats: dict = {}
        t0 = time.perf_counter()
        try:
            res = fn(edges, max_rounds=max_rounds, stats=stats)
            n = res.select("component").distinct().count()
            assert n == expect_components, (tag, n, expect_components)
            out[f"{tag}_rounds"] = float(stats["rounds"])
        except RuntimeError:
            out[f"{tag}_rounds"] = -1.0  # DNF at the cap
        out[f"{tag}_sec"] = round(time.perf_counter() - t0, 3)

    # 50% of 200K nodes in ONE hub component (node 0 has degree 100K);
    # the other 50% are 50K disjoint pairs -> 50_001 components.
    hub = spark.range(1, 100_001).selectExpr(
        "CAST(0 AS BIGINT) AS src", "id AS dst"
    )
    pairs = spark.range(100_001, 200_001, 2).selectExpr(
        "id AS src", "id + 1 AS dst"
    )
    mega = hub.union(pairs)
    run("hub100k_label_prop", mega, CC.connected_components, 50_001, 20)
    run("hub100k_star", mega, CC.connected_components_star, 50_001, 30)

    # Moderate chain: diameter 32 — label prop pays ~one round per hop.
    chain32 = spark.range(32).selectExpr("id AS src", "id + 1 AS dst")
    run("chain32_label_prop", chain32, CC.connected_components, 1, 40)
    run("chain32_star", chain32, CC.connected_components_star, 1, 30)

    # Pathological chain: diameter 4096. Label prop would need ~4K rounds
    # — capped at 12 and recorded as DNF; star converges in O(log n).
    chain4k = spark.range(4096).selectExpr("id AS src", "id + 1 AS dst")
    run("chain4096_label_prop", chain4k, CC.connected_components, 1, 12)
    run("chain4096_star", chain4k, CC.connected_components_star, 1, 30)
    return out


def _skew_join_probe(spark) -> dict:
    """Planted join-key skew: a 20M-row fact whose key column sends 90%
    of all rows to ONE key, equi-joined to a 20K-row dim that is forced
    past the broadcast threshold — the regime where a plain sort-merge
    join serializes behind one straggler partition. Four variants,
    measured on identical inputs (result row count asserted equal):

    - plain SMJ with AQE skew-split OFF: the straggler baseline;
    - plain SMJ with AQE skew-split ON at DEFAULT thresholds (the
      session default, session.py) — which never fires here, see the
      compressed-size blind spot in the variant comment below;
    - the same with a 1 MB skew threshold (thr1mb), where the runtime
      split fires and the oversized partition is divided with the
      matching dim rows replicated — zero code changes;
    - operators/skew.salted_join (n_salts=32, one per core): the explicit
      form for the plans AQE can't rewrite (skewed agg→join chains,
      non-SMJ shapes) — replicates the WHOLE dim n_salts×;
    - operators/skew.split_plan_join (hot key routed to the salted path,
      tail joins plain): replicates only the hot dim rows.

    The documented 100 TB default: leave AQE skew-join ON and reach for
    salting only when the skew sits upstream of the join AQE sees.
    Determinism: the hot/tail key split is xxhash64-derived, no rand().
    """
    from nhl_data_pipeline_spark.operators.skew import (
        salted_join,
        split_plan_join,
    )

    fact = spark.range(20_000_000).selectExpr(
        "CASE WHEN pmod(xxhash64(id), 10) < 9 THEN CAST(0 AS BIGINT)"
        "     ELSE pmod(xxhash64(id, 7), 20000) END AS k",
        "id AS fact_id",
    )
    dim = spark.range(20_000).selectExpr(
        "id AS k", "repeat('d', 64) AS payload"
    )
    out: dict[str, float] = {}
    conf = spark.conf
    prev_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = conf.get("spark.sql.adaptive.skewJoin.enabled")
    # Same discipline as the headline loop: cache cleared (earlier probes
    # persist frames; pinned storage turns this probe into a GC
    # measurement), blocked warmup, median of 3 — one-shot timings of a
    # 1-2 s join flip ordering between runs on this container.
    spark.catalog.clearCache()
    prev_thr = conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    prev_adv = conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        counts = {}
        # Why TWO AQE variants: skew detection reads COMPRESSED map
        # output sizes, and a hot KEY is pathologically compressible —
        # here the count() plan carries only the 8-byte join key, so the
        # 18M-row hot partition LZ4s to a few MB and the 256 MB default
        # threshold never classifies it as skewed (verified: no
        # skew=true marker even with forceOptimizeSkewedJoin). The
        # thr1mb variant drops the threshold (+ advisory split size) to
        # 1 MB, the split fires (SortMergeJoin(skew=true) in the
        # executed plan), and wall drops ~2.2x. Salting still wins: it
        # balances at shuffle-WRITE time on ROW COUNT, which compression
        # can't hide. Same probe-the-defaults discipline as
        # operators/bloom.py's InjectRuntimeFilter notes.
        for tag, skew_on, thr, join_fn in (
            ("plain_smj_aqe_off", "false", None, lambda: fact.join(dim, "k")),
            ("plain_smj_aqe_skew", "true", None, lambda: fact.join(dim, "k")),
            (
                "plain_smj_aqe_skew_thr1mb",
                "true",
                str(1 << 20),
                lambda: fact.join(dim, "k"),
            ),
            (
                "salted_join",
                "false",
                None,
                lambda: salted_join(fact, dim, "k", n_salts=32),
            ),
            (
                "split_plan_join",
                "false",
                None,
                lambda: split_plan_join(
                    fact, dim, "k", hot_keys=[0], n_salts=32
                ),
            ),
        ):
            conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
            conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                thr if thr else prev_thr,
            )
            conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                thr if thr else prev_adv,
            )
            runs = []
            for i in range(4):
                t0 = time.perf_counter()
                counts[tag] = join_fn().count()
                if i > 0:
                    runs.append(time.perf_counter() - t0)
            out[f"{tag}_sec"] = round(sorted(runs)[len(runs) // 2], 3)
        assert len(set(counts.values())) == 1, counts  # identical results
        out["join_rows"] = float(counts["plain_smj_aqe_off"])
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            prev_thr,
        )
        conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_adv
        )
    return out


def _partition_sizing_probe(spark) -> dict:
    """Spill-aware shuffle-partition sizing, measured instead of
    asserted: a ~5.8 GB global sort (48M rows × ~120 B) run with
    shuffle.partitions=4 (≈1.5 GB raw per task — the UnsafeRow working
    set far exceeds even the generous pool share 4 lone tasks get) vs
    64 (≈90 MB per task). Reports wall plus the executed plan's summed
    "spill size" metric from the SQL status store. Measured shape on
    this container: BOTH configs spill at this heap, but the oversized
    config spills roughly double the bytes and runs 2.5-4× slower — the
    local-mode miniature of the 100 TB sizing rule the module docs
    state everywhere (pick shuffle.partitions / maxPartitionBytes so a
    partition working set fits executor memory). Note the pool is
    divided among ACTIVE tasks: 4 partitions also means 4 lone tasks
    with 28 idle cores, so the penalty is spill + lost parallelism
    compounding. Median-of-3 with warmup, like every probe.
    """
    out: dict[str, float] = {}
    spark.catalog.clearCache()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    store = spark._jsparkSession.sharedState().statusStore()

    def spill_bytes_of_last_exec() -> int:
        # summed "spill size" across the last execution's operators;
        # display format "total (min, med, max ...)\n123.4 MiB (...)"
        last = store.executionsList().length() - 1
        return sum(
            b
            for name, raw in _iter_exec_metrics(store, last)
            if name == "spill size"
            and (b := _parse_size_bytes(raw)) is not None
        )

    base = spark.range(48_000_000).selectExpr(
        "id", "repeat('x', 100) AS payload", "xxhash64(id) AS sortkey"
    )
    try:
        for tag, nparts in (("p4_oversized", 4), ("p64_sized", 64)):
            spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
            runs, spills = [], []
            for i in range(4):
                t0 = time.perf_counter()
                base.orderBy("sortkey").write.format("noop").mode(
                    "overwrite"
                ).save()
                w = time.perf_counter() - t0
                time.sleep(0.5)  # listener bus drain
                if i > 0:
                    runs.append(w)
                    spills.append(spill_bytes_of_last_exec())
            out[f"{tag}_sec"] = round(sorted(runs)[len(runs) // 2], 3)
            out[f"{tag}_spill_bytes"] = float(
                sorted(spills)[len(spills) // 2]
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


def _streaming_throughput_probe(spark) -> dict:
    """End-to-end micro-batch throughput for the two streaming state
    shapes: the JVM windowed aggregate (tumbling_counts) and the
    Python-stateful path (applyInPandasWithState sessionize) — the pair
    brackets the engine's streaming cost spectrum. Each runs the full
    sf0.1 events stream (250K rows) through an availableNow memory-sink
    query; wall includes stream planning + state store + sink, and
    engine_rows_per_sec is Spark's own processedRowsPerSecond from the
    query progress log (input rows / batch duration, excluding
    start/stop overhead). Single-file source → one micro-batch; the
    multi-batch state path is covered by the checkpoint-resume and
    bounded-backfill tests, this probe prices the steady-state work.
    """
    import uuid as _uuid

    from nhl_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        tumbling_counts,
    )
    from nhl_data_pipeline_spark.streaming.sessionize import sessionize

    out: dict[str, float] = {}
    # Earlier probes persist frames; a storage-pinned heap makes the
    # Python-stateful path read 5-7x slower (measured: 35 s vs 5 s for
    # the identical query) — this probe prices streaming, not GC debt.
    spark.catalog.clearCache()
    n_rows = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    out["input_rows"] = float(n_rows)
    for tag, build, mode in (
        ("tumbling_agg", lambda ev: tumbling_counts(ev), "complete"),
        ("sessionize_pandas_state", lambda ev: sessionize(ev), "append"),
    ):
        walls, best_rate = [], 0.0
        for i in range(4):  # 1 warmup + 3 timed, median (headline rule)
            name = f"tp_{_uuid.uuid4().hex[:8]}"
            t0 = time.perf_counter()
            q = (
                build(read_events_stream(spark, SF_DIR))
                .writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            rates = [
                p["processedRowsPerSecond"]
                for p in (q.recentProgress or [])
                if p.get("numInputRows", 0) > 0
            ]
            if i > 0:
                walls.append(wall)
                if rates:
                    best_rate = max(best_rate, max(rates))
            spark.catalog.dropTempView(name)
        wall = sorted(walls)[len(walls) // 2]
        out[f"{tag}_sec"] = round(wall, 3)
        out[f"{tag}_wall_rows_per_sec"] = round(n_rows / wall, 1)
        if best_rate:
            out[f"{tag}_engine_rows_per_sec"] = round(best_rate, 1)
    return out


def _pipeline_e2e_probe(spark) -> dict:
    """Operational SLA number for the one-command pipeline (cli.py): the
    reference's implicit budget is a 600 s dbt-Cloud job (BASELINE.md).

    Two blocks:
    - ``e2e_fixtures``: the full CLI path — bronze fixtures → 25-model
      DAG (table models materialized to a scratch warehouse, Hilbert
      writer included) → the 233-instance reference quality suite →
      the CSV export manifest — timed end-to-end at ×1.
    - ``staging_x100``: bronze boxscore+pbp replicated ×100 with
      DISTINCT game ids (the payload's inner ``id`` is rewritten via
      from_json→withField→to_json, offset r*20 inside the 4-digit game
      number so ids stay 10 digits and latest-snapshot dedup sees 100×
      real games), timed through the volume-bound bronze→silver path
      (stg_games + player flatten + shot-event explode → noop). Output
      row counts are asserted to scale exactly ×100 — proof the
      replicas aren't collapsed by the snapshot dedup. The odds/metrics
      tail is deliberately NOT scaled this way: identical team/date
      replicas would give the entity-resolution join an artificial
      100× fan-out no real corpus has; its cost is covered at ×1 and
      grows with distinct games, not snapshots.
    """
    import shutil
    import tempfile

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from nhl_data_pipeline_spark.nhl import facts, schemas, staging
    from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline
    from nhl_data_pipeline_spark.nhl.quality_suite import run_reference_suite
    from nhl_data_pipeline_spark.sources.export import export_all

    fixtures = (
        Path(__file__).resolve().parent
        / "nhl_data_pipeline_spark"
        / "nhl"
        / "bronze_fixtures"
    )
    bronze = {
        t: spark.read.parquet(str(fixtures / t))
        for t in ("game_boxscore", "game_pbp", "schedule", "odds_player_props")
    }
    out: dict[str, float] = {}
    spark.catalog.clearCache()
    tmp = tempfile.mkdtemp(prefix="nhl_e2e_")
    try:
        t0 = time.perf_counter()
        models = run_pipeline(
            spark, bronze, warehouse_dir=f"{tmp}/wh"
        ).models
        out["e2e_models"] = float(len(models))
        checks = run_reference_suite(models, bronze)
        out["e2e_checks"] = float(len(checks))
        out["e2e_checks_failed"] = float(
            sum(1 for c in checks if not c.passed)
        )
        export_all(models, f"{tmp}/csv")
        out["e2e_fixtures_sec"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    def replicate(raw: _DF, schema, n: int) -> _DF:
        p = F.from_json("payload", schema)
        reps = [
            raw.withColumn(
                "payload",
                F.to_json(p.withField("id", p["id"] + F.lit(r * 20))),
            ).withColumn("game_id", F.col("game_id") + F.lit(r * 20))
            for r in range(n)
        ]
        return reduce(_DF.unionAll, reps).repartition(
            spark.sparkContext.defaultParallelism
        )

    box100 = replicate(bronze["game_boxscore"], schemas.boxscore_payload(), 100)
    pbp100 = replicate(bronze["game_pbp"], schemas.pbp_payload(), 100)
    dim_player = spark.createDataFrame(
        staging.stg_player_game_stats(bronze["game_boxscore"])
        .select("player_id")
        .distinct()
        .toPandas()
        .assign(player_name="Probe Player", position_code="C", position_type="F")
    )

    def silver(box, pbp):
        g = staging.stg_games(box)
        pg = staging.stg_player_game_stats(box)
        se = facts.fact_shot_events(pbp, dim_player)
        return g, pg, se

    base_counts = tuple(df.count() for df in silver(bronze["game_boxscore"], bronze["game_pbp"]))
    t0 = time.perf_counter()
    big_counts = tuple(df.count() for df in silver(box100, pbp100))
    out["staging_x100_sec"] = round(time.perf_counter() - t0, 3)
    assert big_counts == tuple(100 * c for c in base_counts), (
        base_counts,
        big_counts,
    )
    out["staging_x100_rows"] = float(sum(big_counts))
    return out


# Statements expected to return zero rows over the ×100 model lake —
# pinned so any statement going empty fails loudly (r8, VERDICT ask #4).
# EMPTY since r10 (VERDICT r9 ask #7): team_3's `team_id = 10` is covered
# by the OTT/WPG fixture teams, and team_8's `CURRENT_DATE - INTERVAL
# '15 days'` window is pinned to the injected as_of=2024-11-15 via
# dialect.rewrite_current_date, so its window intersects the fixture
# season — all 18 statements must now produce rows.
_WORKSHEET_EXPECTED_EMPTY: set[str] = set()
_WORKSHEET_EMPTY_CAUSE = "none expected empty since r10"
_WORKSHEET_AS_OF = "2024-11-15"  # run_pipeline's injected as_of


def _pipeline_scale_probe(spark) -> dict:
    """r7: second-decade scaling for the NHL model DAG + the full analyst
    worksheet corpus at replicated scale (VERDICT r6 asks #6/#7).

    - ``staging_cj_x100/x1000``: bronze boxscore+pbp replicated ×100 and
      ×1000 with DISTINCT game ids via a single-plan crossJoin-range
      replicator (the e2e probe's reduce-union replicate builds an
      n-branch plan — analysis-bound past a few hundred replicas; the
      crossJoin form is how you'd actually fan out synthetic load at
      scale). Same id policy (r*20 payload-id offsets, injective for the
      <20 distinct fixture games). Timed through the volume-bound
      bronze→silver path (stg_games + player flatten + shot-event
      explode → count), counts asserted to scale EXACTLY ×n at both
      decades, and the per-decade exponent emitted:
      exponent = log10(t_x1000 / t_x100) — sublinear (<1) means the
      staging DAG adds no superlinear stage across the second decade.
    - ``dag_x100``: the FULL model DAG (run_pipeline with table/Z-order
      materialization, 25 models) built over the ×100 lake, timed; model
      row counts sanity-asserted (games models scale ×100; odds inputs
      stay ×1 per the e2e probe's fan-out note — shared game_dates give
      the props fact an artificial ×100 match fan-out, which is fine for
      an executability/scale probe and is documented here, but means
      odds-side counts are NOT asserted to a clean multiple).
    - ``worksheets_x100``: ALL 18 verbatim reference worksheet
      statements (10 team + 8 odds) executed over that ×100 model lake
      through the dialect shim — the fixture-scale pytest corpus run at
      replicated scale, with the odds suite's semantic spot-check intact
      (worksheet §1 crosswalk overview == an independent Spark-native
      recount over the same lake). Non-empty counts recorded; the four
      odds statements that are non-empty at ×1 must stay non-empty.
      Skipped (recorded) when /root/reference is absent.
    """
    import math
    import re
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from nhl_data_pipeline_spark.nhl import facts, schemas, staging
    from nhl_data_pipeline_spark.nhl.pipeline import run_pipeline
    from nhl_data_pipeline_spark.plans.dialect import (
        resolve_dbt_refs,
        spark_sql_compat,
    )

    fixtures = (
        Path(__file__).resolve().parent
        / "nhl_data_pipeline_spark"
        / "nhl"
        / "bronze_fixtures"
    )
    bronze = {
        t: spark.read.parquet(str(fixtures / t))
        for t in ("game_boxscore", "game_pbp", "schedule", "odds_player_props")
    }

    def replicate(raw, schema, n: int):
        p = F.from_json("payload", schema)
        return (
            raw.crossJoin(spark.range(n).select(F.col("id").alias("_r")))
            .withColumn(
                "payload",
                F.to_json(p.withField("id", p["id"] + F.col("_r") * 20)),
            )
            .withColumn("game_id", F.col("game_id") + F.col("_r") * 20)
            .drop("_r")
            .repartition(spark.sparkContext.defaultParallelism)
        )

    dim_player = spark.createDataFrame(
        staging.stg_player_game_stats(bronze["game_boxscore"])
        .select("player_id")
        .distinct()
        .toPandas()
        .assign(player_name="Probe Player", position_code="C", position_type="F")
    )

    def silver_counts(box, pbp):
        return (
            staging.stg_games(box).count(),
            staging.stg_player_game_stats(box).count(),
            facts.fact_shot_events(pbp, dim_player).count(),
        )

    out: dict[str, float] = {}
    base = silver_counts(bronze["game_boxscore"], bronze["game_pbp"])

    def staged_at(n: int) -> tuple[tuple, float]:
        spark.catalog.clearCache()
        box = replicate(bronze["game_boxscore"], schemas.boxscore_payload(), n)
        pbp = replicate(bronze["game_pbp"], schemas.pbp_payload(), n)
        t0 = time.perf_counter()
        c = silver_counts(box, pbp)
        return c, time.perf_counter() - t0

    staged_at(100)  # warmup: compiles every silver plan variant
    # min-of-2 per leg (r9, VERDICT ask #5): the gate read 0.848 (r7) →
    # 0.933 (driver r8) vs 0.81 on builder legs — environment noise, not
    # growth, and single-shot legs left 0.017 of cushion to the 0.95
    # gate. Wall-clock noise is one-sided (times only inflate), so the
    # min of 2 reps per leg is the noise-robust estimator — the same
    # reasoning as the sweep tool's per-leg min — and both reps are
    # recorded so drift stays diagnosable.
    #
    # r10 (VERDICT r9 "what's wrong" #3): min-of-2 alone still read
    # 0.921 on the driver vs 0.813 on builder legs — the environment
    # drifts BETWEEN the x100 and x1000 measurement blocks, which a
    # per-leg min cannot divide out. Apply the sweeps' leg-matched
    # anchor recipe: a fixed data-independent micro-anchor measured
    # immediately before each leg, each leg's time divided by ITS OWN
    # anchor before the min, exponent computed from the normalized
    # minima. Raw reps and anchors stay in the artifact.
    # The leg anchor is the SAME shape/estimator as the headline
    # calibration anchor (2^24-row md5 hash-agg, clearCache, min-of-5):
    # a first cut used a lighter 2^23 min-of-3 shape and its own noise
    # (1.48x spread across the probe) exceeded what it was normalizing.
    # Measured here under interleaved heavy jobs: 1.09x spread, ≈0.04
    # exponent noise on a one-decade step.
    leg_anchor = lambda: _calibration_anchor(spark)  # noqa: E731

    # Warm the anchor's OWN codegen to C2 steady state before the first
    # measured use: without this the four anchor readings drift downward
    # ~18% across the probe (the anchor JIT-ing, not the environment),
    # which normalization would misread as the x1000 legs running in a
    # faster environment — inflating the exponent it exists to stabilize.
    leg_anchor()
    a100a = leg_anchor()
    c100, t100a = staged_at(100)
    a100b = leg_anchor()
    _, t100b = staged_at(100)
    a1000a = leg_anchor()
    c1000, t1000a = staged_at(1000)
    a1000b = leg_anchor()
    _, t1000b = staged_at(1000)
    t100, t1000 = min(t100a, t100b), min(t1000a, t1000b)
    t100n = min(t100a / a100a, t100b / a100b)
    t1000n = min(t1000a / a1000a, t1000b / a1000b)
    assert c100 == tuple(100 * c for c in base), (base, c100)
    assert c1000 == tuple(1000 * c for c in base), (base, c1000)
    out["staging_cj_x100_sec"] = round(t100, 3)
    out["staging_cj_x1000_sec"] = round(t1000, 3)
    out["staging_cj_x100_reps"] = [round(t100a, 3), round(t100b, 3)]
    out["staging_cj_x1000_reps"] = [round(t1000a, 3), round(t1000b, 3)]
    out["staging_cj_anchors"] = [
        round(a, 3) for a in (a100a, a100b, a1000a, a1000b)
    ]
    out["staging_x1000_rows"] = float(sum(c1000))
    out["staging_exponent_raw"] = round(math.log10(t1000 / t100), 3)
    out["staging_exponent"] = round(math.log10(t1000n / t100n), 3)
    # r8 (VERDICT ask #6): the second-decade staging exponent is a GATE,
    # not just a recording — a model change that makes staging
    # superlinear fails the bench run instead of drifting (r7 measured
    # 0.848; 0.95 leaves headroom for environment noise while still
    # catching anything structurally worse than linear). Gated on the
    # anchor-normalized value since r10.
    #
    # r13 (VERDICT r12 ask #3): the 0.95 ceiling was calibrated at 32
    # cores. At lower core counts the ×100 leg no longer saturates the
    # box while ×1000 does, so fixed per-leg costs amortize differently
    # and the exponent reads higher with NO per-row growth (the r12
    # 8-core leg read 1.035 and killed the probe). Off the calibrated
    # width the value is recorded, not asserted — the 32-core driver leg
    # keeps the hard gate.
    if _gate_calibrated(spark):
        assert out["staging_exponent"] <= 0.95, out["staging_exponent"]
    else:
        out["staging_exponent_gate"] = (
            "recorded only: gate calibrated at 32 cores, "
            f"running at {spark.sparkContext.defaultParallelism}"
        )

    box100 = replicate(bronze["game_boxscore"], schemas.boxscore_payload(), 100)
    pbp100 = replicate(bronze["game_pbp"], schemas.pbp_payload(), 100)
    # ×1 baseline for the game-grain DAG output (fact_game_results is 2
    # rows per FINISHED game — game_state-filtered, so the multiple must
    # be measured, not assumed from the game count).
    fgr1 = facts.fact_game_results(
        staging.stg_games(bronze["game_boxscore"])
    ).count()
    tmp = tempfile.mkdtemp(prefix="nhl_scale_")
    try:
        # r8 (VERDICT ask #6): the full-DAG leg gets the same asserted
        # exponent ceiling as staging — time the 25-model DAG at ×10 AND
        # ×100 and gate the decade exponent. Fixed per-model costs
        # (planning, Z-order write setup) dominate at ×10, so the
        # expected reading is well under 1; anything ≥ 0.95 means a
        # model went superlinear in data volume.
        spark.catalog.clearCache()
        box10 = replicate(bronze["game_boxscore"], schemas.boxscore_payload(), 10)
        pbp10 = replicate(bronze["game_pbp"], schemas.pbp_payload(), 10)
        t0 = time.perf_counter()
        run_pipeline(
            spark,
            {
                "game_boxscore": box10,
                "game_pbp": pbp10,
                "schedule": bronze["schedule"],
                "odds_player_props": bronze["odds_player_props"],
            },
            warehouse_dir=f"{tmp}/wh10",
        )
        out["dag_x10_sec"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        models = run_pipeline(
            spark,
            {
                "game_boxscore": box100,
                "game_pbp": pbp100,
                "schedule": bronze["schedule"],
                "odds_player_props": bronze["odds_player_props"],
            },
            warehouse_dir=f"{tmp}/wh",
        ).models
        out["dag_x100_sec"] = round(time.perf_counter() - t0, 3)
        assert models["fact_game_results"].count() == 100 * fgr1
        out["dag_x100_models"] = float(len(models))
        out["dag_exponent"] = round(
            math.log10(out["dag_x100_sec"] / out["dag_x10_sec"]), 3
        )
        # Same core-count calibration rule as the staging gate (r13).
        if _gate_calibrated(spark):
            assert out["dag_exponent"] <= 0.95, out["dag_exponent"]
        else:
            out["dag_exponent_gate"] = (
                "recorded only: gate calibrated at 32 cores, "
                f"running at {spark.sparkContext.defaultParallelism}"
            )

        team_ws = Path(
            "/root/reference/dbt_nhl/analysis/team_shot_example_queries.sql"
        )
        odds_ws = Path(
            "/root/reference/dbt_nhl/analysis/odds_matching_queries.sql"
        )
        if not (team_ws.exists() and odds_ws.exists()):
            out["worksheets_x100"] = -1.0  # reference tree absent: recorded
            return out

        def stmts_of(path: Path) -> list[str]:
            raw = re.sub(r"--[^\n]*", "", path.read_text())
            return [s.strip() for s in raw.split(";") if s.strip()]

        from pyspark.sql.types import DateType

        date_cols = {
            f.name
            for v in ("fact_team_game_stats", "team_shot_metrics")
            for f in spark.table(v).schema.fields
            if isinstance(f.dataType, DateType)
        }
        t0 = time.perf_counter()
        executed = nonempty = 0
        empty: list[str] = []
        for i, s in enumerate(stmts_of(team_ws)):
            n = spark_sql_compat(
                spark,
                s,
                name_map={"nhl_analytics.silver.": ""},
                date_columns=date_cols,
                as_of=_WORKSHEET_AS_OF,
            ).count()
            executed += 1
            nonempty += 1 if n else 0
            if not n:
                empty.append(f"team_{i}")
        odds_counts = []
        for i, s in enumerate(stmts_of(odds_ws)):
            odds_counts.append(
                spark_sql_compat(spark, resolve_dbt_refs(s)).count()
            )
            executed += 1
            nonempty += 1 if odds_counts[-1] else 0
            if not odds_counts[-1]:
                empty.append(f"odds_{i}")
        out["worksheets_x100_sec"] = round(time.perf_counter() - t0, 3)
        out["worksheets_x100_executed"] = float(executed)
        out["worksheets_x100_nonempty"] = float(nonempty)
        out["worksheets_x100_empty"] = ",".join(empty)
        out["worksheets_x100_empty_cause"] = _WORKSHEET_EMPTY_CAUSE
        assert executed == 18, executed
        # r8 (VERDICT ask #4): the EXACT expected-empty set is pinned —
        # any OTHER statement going empty (a regression silently
        # emptying a join) fails the probe loudly, as does a fixture /
        # date change making these two produce rows.
        assert set(empty) == _WORKSHEET_EXPECTED_EMPTY, (
            empty,
            _WORKSHEET_EXPECTED_EMPTY,
        )
        assert all(odds_counts[i] > 0 for i in (0, 1, 3, 7)), odds_counts
        # Semantic spot-check intact at scale: worksheet §1 == direct recount
        got = {
            r["match_method"]: r["num_players"]
            for r in spark_sql_compat(
                spark, resolve_dbt_refs(stmts_of(odds_ws)[0])
            ).collect()
        }
        want = {
            r["match_method"]: r["n"]
            for r in models["stg_player_name_crosswalk"]
            .groupBy("match_method")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want and len(got) >= 2, (got, want)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _dedup_scale_probe(spark) -> dict:
    """Empirical crossover evidence for the near-dup family.

    Two regimes, measured:
    - Clean corpora (sf0.01/sf0.1 documents as-is): the naive all-shingle
      join beats PPJoin at local scale (fewer stages, no doc-frequency
      rank); MinHash-LSH is fastest at both SFs and is the sanctioned
      default scale path.
    - Hot-shingle skew ("boiler" rows: every doc shares a 60-token
      boilerplate suffix, the web-template regime): the naive join's
      fan-out is quadratic in per-shingle frequency — measured 5.9 s at
      2000 docs, 17.3 s at 3000, OOM at 5000 — while PPJoin's
      rarest-prefix candidate generation skips the hot shingles entirely
      (3.4-3.8 s flat, 7.8 s at the 5000 docs naive cannot finish).
      PPJoin is the exact-verifier option for skewed corpora.
    - MinHash-LSH on the same boiler corpus demonstrates the OTHER failure
      mode: it finishes fast (the banded join moves only ids) but the
      shared suffix dominates the signatures, so ~515k of the 4.5M
      possible pairs (11%) become candidates — precision collapses and
      the downstream exact verifier inherits a near-quadratic workload.
      The probe records the candidate count so the regime split stays
      honest: clean corpora → MinHash-LSH default; boilerplate-heavy →
      strip boilerplate first (operators/lines.py), use PPJoin, or gate
      the naive join behind drop_stop_shingles (measured on/off below:
      17.0 s → 3.7 s at boiler3k, faster than PPJoin's 7.2 s).
    - sf1-equivalent decade (50K docs, replica-salted ×10 — construction
      details at the block below): all four paths one decade up, plus
      QUALITY numbers — stop-cap recall vs the exact pair set (1.0 on
      this corpus: the df>100 drop loses no true pair) and MinHash-LSH
      candidate recall (0.9992), so the speed/recall trade is measured,
      not asserted.
    """
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from nhl_data_pipeline_spark.operators import dedup as D
    from nhl_data_pipeline_spark.operators import text as X

    out: dict[str, dict[str, float]] = {}
    qs = all_queries()

    def timed(probe: dict, label: str, df) -> None:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        probe[label] = round(time.perf_counter() - t0, 3)

    for sf_dir in ("/root/testdata/sf0.01", SF_DIR):
        probe: dict[str, float] = {}
        timed(probe, "ngram_jaccard_naive", qs["dedup_ngram_jaccard"].fn(spark, sf_dir))
        docs = load_table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
        shl = (
            D.exploded_distinct_shingles(docs, X.tokens(F.col("text")), 3)
            .groupBy("doc_id")
            .agg(F.collect_list("s").alias("sh"))
        )
        timed(probe, "ngram_jaccard_ppjoin", D.prefix_filtered_jaccard_pairs(shl, 0.8))
        timed(probe, "minhash_lsh", qs["dedup_minhash_lsh"].bench_fn(spark, sf_dir))
        out[Path(sf_dir).name] = probe

    def naive_pairs_of(sh):
        a = sh.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"), "s")
        b = sh.select(
            F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"), "s"
        ).hint("shuffle_hash")
        return (
            a.join(b, ["s"])
            .filter(
                (F.col("doc_a") < F.col("doc_b"))
                & (4 * F.greatest("n_a", "n_b") <= 5 * F.least("n_a", "n_b"))
            )
            .groupBy("doc_a", "doc_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .filter(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
                >= 0.8
            )
        )

    # Hot-shingle regime: 3000 sf0.1 docs + shared 60-token boilerplate.
    # (3000, not 5000: the naive join OOMs at 5000 — see docstring.)
    boiler = " ".join(f"footer{i} legal{i} nav{i}" for i in range(20))
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 3000)
        .withColumn("text", F.concat_ws(" ", "text", F.lit(boiler)))
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    probe = {}
    sh = D.exploded_distinct_shingles(
        docs, X.tokens(F.col("text")), 3, hash_shingles=True
    ).persist()
    timed(probe, "ngram_jaccard_naive", naive_pairs_of(sh))
    # Stop-shingle gate ON: drop shingles with df > 100 (the 58 boilerplate
    # shingles have df = 3000) before the same join — the README's
    # prescribed 100-TB skew mitigation, here actually measured.
    timed(
        probe,
        "ngram_jaccard_naive_stopcap100",
        naive_pairs_of(D.drop_stop_shingles(sh, max_df=100)),
    )
    sh.unpersist()
    shl = (
        D.exploded_distinct_shingles(docs, X.tokens(F.col("text")), 3)
        .groupBy("doc_id")
        .agg(F.collect_list("s").alias("sh"))
    )
    timed(probe, "ngram_jaccard_ppjoin", D.prefix_filtered_jaccard_pairs(shl, 0.8))
    # LSH candidate precision in the skewed regime (see docstring): the
    # count is the story — timing alone would mislead, since the banded
    # join only moves ids.
    from nhl_data_pipeline_spark.plans.q_text import minhash_band_pairs

    t0 = time.perf_counter()
    n_cand = minhash_band_pairs(docs).count()
    probe["minhash_lsh"] = round(time.perf_counter() - t0, 3)
    probe["minhash_lsh_candidate_pairs"] = float(n_cand)
    out["sf0.1_boiler3k"] = probe

    # sf1-equivalent decade: 10× the sf0.1 corpus (50K docs). Replica r>0
    # prefixes every 4th token with a replica salt, which kills every
    # 3-shingle window covering a mutated position: cross-replica jaccard
    # of the same doc is ~0.14 (windows at pos ≡ 1 mod 4 survive), far
    # below the 0.8 threshold, while WITHIN-replica near-dup structure is
    # preserved exactly (the same mutation hits both members of a planted
    # pair). The surviving ~1/4 of shingles are identical across all 10
    # replicas — df × 10 on a quarter of the universe — so the probe
    # genuinely stresses the naive join's Σdf² fan-out one decade up, not
    # just 10× more rows of independent text.
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = [base]
    for r in range(1, 10):
        mut = F.array_join(
            F.transform(
                X.tokens(F.col("text")),
                lambda tok, i: F.when(
                    i % 4 == 0, F.concat(F.lit(f"r{r}x"), tok)
                ).otherwise(tok),
            ),
            " ",
        )
        reps.append(
            base.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                mut.alias("text"),
            )
        )
    big = reduce(DataFrame.unionAll, reps).repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    probe = {}
    sh = D.exploded_distinct_shingles(
        big, X.tokens(F.col("text")), 3, hash_shingles=True
    ).persist()
    timed(probe, "ngram_jaccard_naive", naive_pairs_of(sh))
    timed(
        probe,
        "ngram_jaccard_naive_stopcap100",
        naive_pairs_of(D.drop_stop_shingles(sh, max_df=100)),
    )
    sh.unpersist()
    shl = (
        D.exploded_distinct_shingles(big, X.tokens(F.col("text")), 3)
        .groupBy("doc_id")
        .agg(F.collect_list("s").alias("sh"))
    )
    timed(probe, "ngram_jaccard_ppjoin", D.prefix_filtered_jaccard_pairs(shl, 0.8))
    timed(probe, "minhash_lsh", minhash_band_pairs(big))
    # Quality metrics at the decade scale (not just wall-clock): the
    # stop-cap's semantic cost (pairs lost by treating hot shingles as
    # stop-words) and MinHash-LSH candidate recall vs the exact pair set.
    sh = D.exploded_distinct_shingles(
        big, X.tokens(F.col("text")), 3, hash_shingles=True
    ).persist()
    exact = naive_pairs_of(sh).select("doc_a", "doc_b").persist()
    n_exact = exact.count()
    n_stopcap = (
        naive_pairs_of(D.drop_stop_shingles(sh, max_df=100))
        .select("doc_a", "doc_b")
        .join(exact, ["doc_a", "doc_b"], "left_semi")
        .count()
    )
    n_lsh_hit = (
        minhash_band_pairs(big)
        .join(exact, ["doc_a", "doc_b"], "left_semi")
        .count()
    )
    probe["exact_pairs"] = float(n_exact)
    probe["stopcap_recall"] = round(n_stopcap / n_exact, 4) if n_exact else 1.0
    probe["minhash_lsh_recall"] = (
        round(n_lsh_hit / n_exact, 4) if n_exact else 1.0
    )
    exact.unpersist()
    sh.unpersist()
    out["sf1_50k"] = probe
    return out


def _ann_scale_probe(spark) -> dict:
    """Vector-search scale evidence, the ANN analog of the dedup probe.

    The sf0.1 embeddings table is tiny (2K vectors), so the probe also
    builds a 50×-replicated corpus (100K vectors; replica r>0 perturbs
    every element deterministically so the copies are distinct points in
    tight clusters — the natural-embedding regime, unlike the base
    table's near-uniform synthetic vectors). At both scales:
    - brute-force cosine top-10, JVM HOF form (exact baseline; x1 only at
      the big scale's query load it would dominate the bench) and the
      Arrow/numpy matmul form (the exact throughput path);
    - IVF split into its true cost centers: TRAIN+ASSIGN (k-means fit +
      corpus bucketing — at 100 TB this is WRITE-time partitioning, paid
      once per ingest) vs SCORE (probes join + rank over nprobe/k of the
      corpus — the recurring READ-side cost);
    - IVF top-10 recall vs the exact baseline at nprobe=4 and 8.
    Expected story, measured not asserted: recall on the near-uniform x1
    vectors is poor (random points don't bucket — IVF presumes
    clusterable data) and rises on the clustered x50 corpus; the scoring
    side is the only cost that recurs per query batch.
    """
    import time as _t

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from nhl_data_pipeline_spark.operators.kmeans import kmeans
    from nhl_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_numpy,
        norm,
    )
    from nhl_data_pipeline_spark.operators.similarity import dot as _dot

    n_queries, k = 16, 10
    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    queries = base.filter(F.col("vec_id") < n_queries)

    reps = [base]
    for r in range(1, 50):
        perturbed = F.transform(
            F.col("embedding"),
            lambda x, i: x + F.lit(float(r)) * 0.003 * ((i % 7).cast("float") - 3.0),
        )
        reps.append(
            base.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                perturbed.alias("embedding"),
            )
        )
    big = reduce(_DF.unionAll, reps).repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    )

    def ivf_score(assigned, cents, nprobe):
        from pyspark.sql.window import Window as W

        from nhl_data_pipeline_spark.operators.kmeans import (
            _lit_matrix,
            _sq_dist,
        )

        qd = F.transform(_lit_matrix(cents), lambda c: _sq_dist(F.col("embedding"), c))
        # probe slots via sorted (distance, index) STRUCTS, not
        # array_position over raw distances: struct sort breaks distance
        # ties on the index, so the nprobe slots are always DISTINCT
        # clusters (array_position would resolve a tie to the first match
        # twice -> duplicate probes and double-counted recall hits).
        slots = F.slice(
            F.array_sort(
                F.transform(qd, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
            ),
            1,
            nprobe,
        )
        probes = queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            norm(F.col("embedding")).alias("q_nrm"),
            F.explode(slots).alias("_s"),
        ).select(
            "query_id",
            "q_vec",
            "q_nrm",
            F.col("_s.i").cast("int").alias("cluster_id"),
        )
        cand = assigned.select(
            "cluster_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
            norm(F.col("embedding")).alias("c_nrm"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            probes.join(cand, "cluster_id")
            .withColumn(
                "cosine",
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_nrm") * F.col("c_nrm")),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id")
        )

    out: dict[str, dict] = {}
    for label, corpus in (("x1_2k", base), ("x50_100k", big)):
        cands = corpus.filter(F.col("vec_id") >= n_queries)
        block: dict[str, float] = {}

        def timed(name: str, df) -> None:
            t0 = _t.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            block[name] = round(_t.perf_counter() - t0, 3)

        if label == "x1_2k":
            timed("bruteforce_hof", cosine_topk(queries, cands, k))
        timed("bruteforce_numpy", cosine_topk_numpy(queries, cands, k))

        t0 = _t.perf_counter()
        assigned, cents = kmeans(cands, 32, 2)
        assigned = assigned.persist()
        assigned.write.format("noop").mode("overwrite").save()
        block["ivf_train_assign_writetime"] = round(_t.perf_counter() - t0, 3)
        timed("ivf_score_readtime_nprobe4", ivf_score(assigned, cents, 4))

        # recall baseline: the NUMPY exact top-k at BOTH scales (the HOF
        # exact would re-run an 11 s+ scan at x50 just to re-derive the
        # same set; numpy vs HOF can differ only on last-ulp rank-k ties,
        # noise for a recall metric). Persisted: one computation serves
        # both nprobe points.
        exact = (
            cosine_topk_numpy(queries, cands, k)
            .select("query_id", "neighbor_id")
            .persist()
        )
        n_exact = exact.count()
        for nprobe in (4, 8):
            n_hit = (
                ivf_score(assigned, cents, nprobe)
                .join(exact, ["query_id", "neighbor_id"], "left_semi")
                .count()
            )
            block[f"ivf_recall_at_10_nprobe{nprobe}"] = (
                round(n_hit / n_exact, 4) if n_exact else 1.0
            )
        exact.unpersist()
        assigned.unpersist()
        out[label] = block
    return out



if __name__ == "__main__":
    main()
