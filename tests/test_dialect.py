"""QUALIFY dialect shim: Snowflake worksheets run on Spark unchanged.

Spark 4.x does not parse QUALIFY (SURVEY §7.3 risk 1, verified); the shim
rewrites it to the subquery form with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.plans.dialect import rewrite_qualify, spark_sql_compat
from tests.conftest import TEST_SF_DIR


def _orders_view(spark):
    load_table(spark, TEST_SF_DIR, "orders").createOrReplaceTempView("orders_v")


def test_qualify_latest_snapshot_pattern(spark):
    """The W1 idiom (`stg_games.sql:32`): latest row per key via QUALIFY."""
    _orders_view(spark)
    got = spark_sql_compat(
        spark,
        """
        SELECT * FROM orders_v
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
        ) = 1
        """,
    )
    o = load_table(spark, TEST_SF_DIR, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    want = o.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    assert got.columns == o.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_qualify_with_trailing_order_by_limit(spark):
    _orders_view(spark)
    got = spark_sql_compat(
        spark,
        """
        SELECT o_custkey, o_orderkey, o_totalprice FROM orders_v
        QUALIFY RANK() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ) <= 2
        ORDER BY o_custkey, o_orderkey LIMIT 10
        """,
    ).collect()
    assert len(got) == 10
    # ordered by custkey then orderkey
    keys = [(r.o_custkey, r.o_orderkey) for r in got]
    assert keys == sorted(keys)


def test_no_qualify_passthrough(spark):
    _orders_view(spark)
    sql = "SELECT count(*) AS n FROM orders_v"
    assert rewrite_qualify(sql) is sql
    assert spark_sql_compat(spark, sql).first()["n"] > 0


def test_qualify_inside_string_or_parens_not_rewritten(spark):
    sql = "SELECT 'qualify' AS word, (SELECT 1) AS one FROM range(1)"
    assert rewrite_qualify(sql) is sql


def test_iff_rewrite(spark):
    got = spark_sql_compat(
        spark, "SELECT IFF(1 = 1, 'yes', 'no') AS v FROM range(1)"
    ).first()["v"]
    assert got == "yes"
    # word boundaries respected: a column named tariff_( would be absurd,
    # but `diff(` must not become `dif(`
    from nhl_data_pipeline_spark.plans.dialect import rewrite_iff

    assert rewrite_iff("SELECT sniff('x')") == "SELECT sniff('x')"


def test_qualify_untouched_inside_doubled_quote_escape():
    """'it''s' must not desync the string tracker: the QUALIFY inside the
    literal stays literal, and a REAL depth-0 QUALIFY after it still
    rewrites correctly."""
    from nhl_data_pipeline_spark.plans.dialect import rewrite_qualify

    sql = "SELECT 'it''s a qualify trap' AS note, x FROM t"
    assert rewrite_qualify(sql) == sql

    sql2 = (
        "SELECT 'don''t qualify here' AS note, x, "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn "
        "FROM t QUALIFY rn = 1"
    )
    out = rewrite_qualify(sql2)
    assert out != sql2, "the depth-0 QUALIFY must be rewritten"
    assert "QUALIFY rn = 1" not in out
    assert "don''t qualify here" in out, "the literal must survive intact"


def test_quoted_datetime_units_rewrite(spark):
    """Snowflake's DATEADD('day', ...) / DATEDIFF('day', ...) run through
    the shim; date_trunc's quoted unit is left alone (Spark requires it)."""
    from nhl_data_pipeline_spark.plans.dialect import (
        rewrite_quoted_datetime_units,
        spark_sql_compat,
    )

    assert (
        rewrite_quoted_datetime_units("DATEADD('day', -1, d)")
        == "DATEADD(day, -1, d)"
    )
    assert (
        rewrite_quoted_datetime_units("date_trunc('day', ts)")
        == "date_trunc('day', ts)"
    )
    # verbatim dim_date.sql idiom (reference:
    # dbt_nhl/models/silver/dim_date.sql): a date spine via quoted-unit
    # DATEADD over a generator
    rows = spark_sql_compat(
        spark,
        """
        SELECT DATEADD('day', n, '2020-01-01'::DATE) AS d,
               DATEDIFF('day', '2020-01-01'::DATE,
                        DATEADD('day', n, '2020-01-01'::DATE)) AS delta
        FROM (SELECT explode(sequence(0, 4)) AS n)
        """,
    ).collect()
    assert len(rows) == 5
    assert all(r["delta"] == i for i, r in enumerate(sorted(rows, key=lambda r: r["d"])))


def test_distinct_order_alias_rewrite_skips_string_literals(spark):
    """The alias substitution in the ORDER BY tail must not touch a
    select-list expression occurring inside a string literal, and must
    stop at a depth-0 LIMIT (matching the module's literal-aware rules)."""
    from nhl_data_pipeline_spark.plans.dialect import (
        rewrite_distinct_order_aliases,
    )

    sql = (
        "SELECT DISTINCT p.player_name AS odds_player_name FROM t p "
        "ORDER BY p.player_name, 'p.player_name is a literal' LIMIT 5"
    )
    out = rewrite_distinct_order_aliases(sql)
    # the bare ORDER BY expression was rewritten to its alias...
    assert "ORDER BY odds_player_name" in out
    # ...the literal survived verbatim, and the LIMIT tail is untouched
    assert "'p.player_name is a literal'" in out
    assert out.endswith("LIMIT 5")


def test_dateadd_date_rewrite(spark):
    """Opt-in DATEADD type-drift closure (ADVICE r5): Snowflake's
    DATEADD('day', n, date_col) returns DATE; with the column names
    supplied, the Spark round-trip is DATE-typed too. Non-column third
    arguments and unknown columns are untouched."""
    from nhl_data_pipeline_spark.plans.dialect import (
        rewrite_dateadd_date,
        spark_sql_compat,
    )

    # unit form after rewrite_quoted_datetime_units; qualified ref matches
    # on its last segment
    assert (
        rewrite_dateadd_date(
            "SELECT dateadd(day, 3, g.game_date) FROM g", {"game_date"}
        )
        == "SELECT CAST(dateadd(day, 3, g.game_date) AS DATE) FROM g"
    )
    # expression / literal / unknown-column third args: untouched
    for sql in (
        "SELECT dateadd(day, 1, ts + INTERVAL '1' HOUR) FROM t",
        "SELECT dateadd(day, 1, '2020-01-01'::DATE) FROM t",
        "SELECT dateadd(day, 1, event_ts) FROM t",
    ):
        assert rewrite_dateadd_date(sql, {"game_date"}) == sql
    # a dateadd inside a string literal is never rewritten
    lit = "SELECT 'dateadd(day, 1, game_date)' AS s FROM t"
    assert rewrite_dateadd_date(lit, {"game_date"}) == lit

    # end-to-end: Snowflake worksheet form round-trips to a DATE column
    spark.sql("SELECT CAST('2024-11-01' AS DATE) AS game_date").createOrReplaceTempView(
        "dd_games"
    )
    df = spark_sql_compat(
        spark,
        "SELECT DATEADD('day', 7, game_date) AS next_week FROM dd_games",
        date_columns={"game_date"},
    )
    assert df.schema["next_week"].dataType.simpleString() == "date"
    assert str(df.collect()[0]["next_week"]) == "2024-11-08"


def test_current_date_rewrite(spark):
    """rewrite_current_date pins CURRENT_DATE / current_date() to the
    injected as_of literal (VERDICT r9 ask #7: the worksheet's 15-day
    recent-form window must be reproducible against a fixed-season lake,
    per the engine's injected-time policy)."""
    import pytest as _pytest

    from nhl_data_pipeline_spark.plans.dialect import rewrite_current_date

    sql = (
        "SELECT * FROM t WHERE game_date >= CURRENT_DATE - INTERVAL "
        "'15 days' AND d2 < current_date() AND d3 = current_date"
    )
    got = rewrite_current_date(sql, "2024-11-15")
    assert "CURRENT_DATE" not in got.upper().replace(
        "DATE '2024-11-15'", ""
    )
    assert got.count("DATE '2024-11-15'") == 3
    # a column named like a prefix is untouched
    assert (
        rewrite_current_date("SELECT current_date_col FROM t", "2024-11-15")
        == "SELECT current_date_col FROM t"
    )
    with _pytest.raises(ValueError):
        rewrite_current_date("SELECT 1", "not-a-date")

    # end-to-end through the shim: the worksheet's window form evaluates
    # against the injected date, independent of wall-clock
    spark.sql(
        "SELECT CAST('2024-11-10' AS DATE) AS game_date"
    ).createOrReplaceTempView("cd_games")
    df = spark_sql_compat(
        spark,
        "SELECT game_date FROM cd_games WHERE game_date >= "
        "CURRENT_DATE - INTERVAL '15 days'",
        as_of="2024-11-15",
    )
    assert df.count() == 1


def test_rewriters_are_literal_and_comment_blind(spark):
    """r12 (VERDICT r11 ask #6): the shared quote-aware splitter — every
    token-substituting rewriter must leave string literals and SQL
    comments byte-identical. Each case poisons a literal AND a comment
    with the rewriter's own trigger token."""
    from nhl_data_pipeline_spark.plans.dialect import (
        rewrite_current_date,
        rewrite_iff,
        rewrite_qualified_names,
        rewrite_quoted_datetime_units,
    )

    # CURRENT_DATE inside a literal / line comment / block comment
    sql = (
        "SELECT 'policy: CURRENT_DATE is injected', d  -- CURRENT_DATE note\n"
        "/* CURRENT_DATE block */ FROM t WHERE d >= CURRENT_DATE"
    )
    got = rewrite_current_date(sql, "2024-11-15")
    assert "'policy: CURRENT_DATE is injected'" in got
    assert "-- CURRENT_DATE note" in got
    assert "/* CURRENT_DATE block */" in got
    assert got.count("DATE '2024-11-15'") == 1  # only the live token

    # IFF( inside a literal stays text; the live call is rewritten
    sql = "SELECT 'uses IFF(x)', IFF(a > 0, 1, 0) FROM t"
    got = rewrite_iff(sql)
    assert "'uses IFF(x)'" in got and "if(a > 0" in got

    # DATEADD('day', …) quoted-unit strip skips literals/comments
    sql = (
        "SELECT 'dateadd(''day'', doc)' AS label, "
        "DATEADD('day', -1, d) FROM t -- dateadd('day', …) docs"
    )
    got = rewrite_quoted_datetime_units(sql)
    assert "'dateadd(''day'', doc)'" in got
    assert "-- dateadd('day', …) docs" in got
    assert "DATEADD(day, -1, d)" in got

    # qualified-name mapping skips a name quoted as TEXT
    sql = (
        "SELECT 'nhl_analytics.silver.x' AS src "
        "FROM nhl_analytics.silver.fact_games"
    )
    got = rewrite_qualified_names(sql, {"nhl_analytics.silver.": ""})
    assert "'nhl_analytics.silver.x'" in got
    assert "FROM fact_games" in got

    # end-to-end: a poisoned literal survives the full compat shim and
    # the live CURRENT_DATE still evaluates against the injected date
    spark.sql(
        "SELECT CAST('2024-11-10' AS DATE) AS game_date"
    ).createOrReplaceTempView("cd_games2")
    df = spark_sql_compat(
        spark,
        "SELECT 'see CURRENT_DATE docs' AS note, game_date FROM cd_games2 "
        "WHERE game_date >= CURRENT_DATE - INTERVAL '15 days'",
        as_of="2024-11-15",
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].note == "see CURRENT_DATE docs"


def test_comment_aware_qualify(spark):
    """A QUALIFY mentioned only in a comment must not trigger the
    subquery rewrite; a real QUALIFY below a comment still does."""
    from nhl_data_pipeline_spark.plans.dialect import rewrite_qualify

    sql = "SELECT a FROM t -- QUALIFY would go here\nWHERE a > 0"
    assert rewrite_qualify(sql) == sql
    sql2 = (
        "SELECT a, b FROM t -- QUALIFY in a note\n"
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1"
    )
    out = rewrite_qualify(sql2)
    assert out != sql2 and "__qualify" in out
    assert "-- QUALIFY in a note" in out
