"""Local mirror of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical form of every value. Used by tests/test_parity.py
and the ad-hoc ``python -m nhl_data_pipeline_spark.plans.parity`` CLI.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from nhl_data_pipeline_spark.catalog import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


def _canon_value(v) -> str:
    """Canonical string for hashing/compare. Floats by exact bit pattern."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        return struct.pack("<d", v).hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return repr(v)


def _canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    out = df[cols]
    rows = sorted(
        tuple(_canon_value(v) for v in row) for row in out.itertuples(index=False)
    )
    return cols, rows


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    sf_dir: str,
) -> ParityResult:
    from nhl_data_pipeline_spark.plans.registry import all_queries

    spec = all_queries()[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return ParityResult(name, True, "rows-only (no oracle)", len(sdf), -1)
    odf = con.execute(spec.oracle).fetchdf()
    s_cols, s_rows = _canon_frame(sdf)
    o_cols, o_rows = _canon_frame(odf)
    if s_cols != o_cols:
        return ParityResult(
            name, False, f"columns differ: spark={s_cols} oracle={o_cols}",
            len(sdf), len(odf),
        )
    if len(s_rows) != len(o_rows):
        return ParityResult(
            name, False, f"row count differs: {len(s_rows)} vs {len(o_rows)}",
            len(sdf), len(odf),
        )
    if s_rows != o_rows:
        bad = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
        return ParityResult(
            name, False,
            f"values differ at sorted-row {bad}:\n  spark : {s_rows[bad]}\n  oracle: {o_rows[bad]}",
            len(sdf), len(odf),
        )
    return ParityResult(name, True, "match", len(sdf), len(odf))


def main() -> None:
    import argparse

    from nhl_data_pipeline_spark.plans.registry import all_queries
    from nhl_data_pipeline_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json-out",
        default=None,
        help="also write a PARITY_*.json artifact (r9: tool-emitted, so "
        "every committed parity artifact traces to one run)",
    )
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    args = ap.parse_args()

    spark = get_spark("parity")
    con = duck_connection(args.sf_dir)
    names = args.names or list(all_queries())
    failed = 0
    rows: dict[str, dict] = {}
    for name in names:
        r = compare_query(spark, con, name, args.sf_dir)
        print(f"{'PASS' if r.ok else 'FAIL'} {name} ({r.spark_rows} rows) {r.detail if not r.ok else ''}")
        rows[name] = {"ok": r.ok, "rows": r.spark_rows}
        if not r.ok:
            rows[name]["detail"] = r.detail
        failed += 0 if r.ok else 1
    print(f"{len(names) - failed}/{len(names)} queries match")
    if args.json_out:
        import json
        import subprocess
        from pathlib import Path

        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                cwd=Path(__file__).resolve().parents[2],
            ).stdout.strip()
        except Exception:
            commit = "unknown"
        Path(args.json_out).write_text(
            json.dumps(
                {
                    "sf_dir": args.sf_dir,
                    "engine_commit": commit,
                    "queries_pass": len(names) - failed,
                    "queries_total": len(names),
                    "method": (
                        "full driver-style gate per query: row count + "
                        "column names + order-insensitive value hash, "
                        "Spark vs DuckDB oracle; single run, artifact "
                        "emitted by plans/parity.py --json-out"
                    ),
                    "queries": rows,
                },
                indent=1,
            )
            + "\n"
        )
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    main()
