"""Result export sinks (reference operator S9).

The reference exports 11 silver models to Google Sheets worksheets and 2-3
to CSV for Tableau (src/nhl_pipeline/export/sheets_export.py:39-133,
tableau_export.py:41-173). Spark-side: CSV is a native writer; the Sheets
hop is driver-side pandas → gspread and is stubbed behind an import-try
(network + credentials are environment concerns, not engine surface).
Row-cap guard reproduced: Sheets rejects ~48K rows (.context/
DECISIONS.md:481-487).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SHEETS_ROW_CAP = 25_000  # practical max before the API chokes (DECISIONS.md:487)


def export_csv(df: DataFrame, path: str) -> None:
    """CSV sink with header, single file per model (Tableau-sized outputs
    are small by construction — coalesce is deliberate)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def export_sheets(df: DataFrame, spreadsheet: str, worksheet: str) -> int:
    """Google Sheets export: toPandas → gspread, guarded by the row cap.

    Raises NotImplementedError where gspread/credentials are absent (this
    container); the cap check and the pandas hop — the engine-side logic —
    run regardless, so the guard is testable offline.
    """
    n = df.count()
    if n > SHEETS_ROW_CAP:
        raise ValueError(
            f"{worksheet}: {n} rows exceeds the Sheets practical cap "
            f"({SHEETS_ROW_CAP}); export a filtered model instead "
            "(the reference's Bruins-only models exist for this reason)"
        )
    pdf = df.toPandas()
    try:
        import gspread  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            f"gspread not installed; {len(pdf)} rows ready for {spreadsheet}/{worksheet}"
        ) from e
    raise NotImplementedError("wire gspread client here when credentials exist")
