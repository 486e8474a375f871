"""Bloom-filter join pre-pruning: identical-result guarantee, measured
selectivity, plan placement, partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.operators import bloom as B
from tests.conftest import TEST_SF_DIR


def _sides(spark):
    orders = load_table(spark, TEST_SF_DIR, "orders")
    cust = load_table(spark, TEST_SF_DIR, "customer").filter(
        F.col("c_nationkey") == 3
    )
    return orders, cust


def _joined(orders, cust):
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_custkey", "o_totalprice")
        .collect()
    )


def test_prejoin_results_identical_to_plain_join(spark):
    orders, cust = _sides(spark)
    pruned = B.bloom_prejoin(orders, "o_custkey", cust, "c_custkey")
    assert sorted(map(tuple, _joined(pruned, cust))) == sorted(
        map(tuple, _joined(orders, cust))
    )


def test_prune_rate_tracks_join_selectivity(spark):
    orders, cust = _sides(spark)
    pruned = B.bloom_prejoin(orders, "o_custkey", cust, "c_custkey")
    n_all, n_pruned = orders.count(), pruned.count()
    # matching rows MUST survive (no false negatives) ...
    n_match = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    ).count()
    assert n_pruned >= n_match
    # ... and the filter must actually prune: one nation ≈ 1/25 of
    # customers, so well under half the orders should pass (ε=1% fpp at
    # these sizes adds ~nothing).
    assert n_pruned < n_all / 2


def test_no_false_negatives_even_when_saturated(spark):
    # Tiny filter (256 bits) on 1500 keys -> heavily saturated, high fpp;
    # the invariant that every true key passes must still hold.
    orders, _ = _sides(spark)
    cust_all = load_table(spark, TEST_SF_DIR, "customer")
    words = B.bloom_build(cust_all, "c_custkey", n_bits=256)
    passed = orders.filter(
        B.bloom_might_contain(words, F.col("o_custkey"))
    ).count()
    assert passed == orders.count()  # every order has a real customer


def test_build_is_partitioning_invariant(spark):
    _, cust = _sides(spark)
    assert B.bloom_build(cust, "c_custkey") == B.bloom_build(
        cust.repartition(7), "c_custkey"
    )


def test_filter_sits_below_the_join_exchange(spark):
    orders, cust = _sides(spark)
    pruned = B.bloom_prejoin(orders, "o_custkey", cust, "c_custkey")
    # force a shuffle join so the Exchange is in the plan
    plan = (
        pruned.hint("merge")
        .join(cust, pruned.o_custkey == cust.c_custkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bloom conjunction (pmod over xxhash64) must appear in a Filter,
    # and the scan side of the plan must filter before exchanging
    assert "pmod" in plan and "xxhash64" in plan
    filter_pos = plan.index("pmod")
    exchange_pos = plan.index("Exchange")
    assert "Filter" in plan
    # Executed-plan text lists operators top-down (sink first): the
    # Exchange prints ABOVE the scan-side Filter that feeds it.
    assert exchange_pos < filter_pos


def test_mixed_integral_widths_still_match(spark):
    """xxhash64 is type-sensitive; the string normalization must make an
    INT build side and a BIGINT apply side agree (no false negatives)."""
    small = spark.range(100).selectExpr("CAST(id AS INT) AS k")
    big = spark.range(1000).selectExpr("CAST(id AS BIGINT) AS k")
    pruned = B.bloom_prejoin(big, "k", small, "k", n_bits=1 << 12)
    survivors = {r["k"] for r in pruned.collect()}
    assert set(range(100)) <= survivors  # every true match survives


def test_cross_type_key_pairs_rejected(spark):
    """Any non-integral cross-type pair desyncs the hashed string form
    from the join's implicit cast (string '05' vs bigint 5 would match in
    a join but be pruned here; same for date vs timestamp and int vs
    double) — all must be refused, not silently mis-pruned."""
    import pytest

    big = spark.range(10).selectExpr("CAST(id AS BIGINT) AS k")
    for small_expr in (
        "CAST(id AS DOUBLE) AS k",
        "CAST(id AS STRING) AS k",
        "CAST(id AS DECIMAL(10,2)) AS k",
    ):
        small = spark.range(10).selectExpr(small_expr)
        with pytest.raises(ValueError, match="types differ"):
            B.bloom_prejoin(big, "k", small, "k")
    d = spark.sql("SELECT DATE'2024-01-01' AS k")
    ts = spark.sql("SELECT TIMESTAMP'2024-01-01 00:00:00' AS k")
    with pytest.raises(ValueError, match="types differ"):
        B.bloom_prejoin(ts, "k", d, "k")


def test_bad_n_bits_rejected(spark):
    import pytest

    small = spark.range(10).selectExpr("id AS k")
    with pytest.raises(ValueError, match="multiple of 64"):
        B.bloom_build(small, "k", n_bits=100)


def test_negative_zero_float_keys_not_pruned(spark):
    """Spark join keys equate -0.0 with 0.0 (NormalizeFloatingNumbers);
    the filter's string hashing must see the same equivalence or a true
    match is silently pruned."""
    small = spark.createDataFrame([(0.0,), (2.5,)], "k double")
    big = spark.createDataFrame([(-0.0,), (2.5,), (9.9,)], "k double")
    # the plain join DOES match -0.0 to 0.0
    assert big.join(small, "k").count() == 2
    pruned = B.bloom_prejoin(big, "k", small, "k", n_bits=1 << 12)
    survivors = [r["k"] for r in pruned.collect()]
    assert 2.5 in survivors
    assert any(v == 0.0 for v in survivors)  # -0.0 row must survive
