"""Fixed-token document chunking with overlap.

The context-window preparation stage of an embedding / training pipeline:
long documents are split into chunks of ``chunk_tokens`` whitespace tokens,
consecutive chunks sharing ``overlap`` tokens so no boundary sentence is
seen without context. Complements `plans/q_text.py::sequence_packing`
(which CONCATENATES short docs up to a budget); chunking SPLITS long docs
down to one.

Scale shape: pure per-row whole-stage codegen — posexplode over a
``sequence(...)`` of chunk starts, ``slice`` of the tokens array,
``array_join`` back to text. No shuffle, no Python, fan-out per doc is
⌈(n_tok − overlap) / stride⌉, linear in document length. At 100 TB this
is a map stage that pipelines into whatever scan feeds it; the only
planning concern is downstream partition sizing after the fan-out, which
is AQE's coalesce/split job.

Determinism: chunk boundaries are a pure function of the token array, so
chunked output is stable across partitionings and engines — the DuckDB
twin in tests/test_chunking.py reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.operators.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, n_chunks, n_tokens, chunk_text) — one row per chunk.

    Chunk i covers token positions [i·stride, i·stride + chunk_tokens)
    where stride = chunk_tokens − overlap; the final chunk may be short
    but is never empty, and a trailing window that would start inside the
    previous chunk's un-overlapped span is not emitted (i.e. n_chunks =
    max(1, ⌈(n_tok − overlap) / stride⌉) for non-empty docs). Docs with
    zero tokens produce no rows — curation drops them earlier anyway.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    n_tok = F.size("_toks")
    # ceil((n_tok - overlap) / stride), floored at 1 for any non-empty doc
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n_tok - F.lit(overlap)) / F.lit(stride)).cast("int"),
    )
    return (
        docs.select(id_col, toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            n_tok.cast("int").alias("n_tokens"),
            n_chunks.alias("n_chunks"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(
                        F.slice(
                            F.col("_toks"),
                            i * stride + 1,
                            F.lit(chunk_tokens),
                        ),
                        " ",
                    ),
                )
            ).alias("chunk_id", "chunk_text"),
        )
        .select(id_col, "chunk_id", "n_chunks", "n_tokens", "chunk_text")
    )


def chunk_documents_sql(
    chunk_tokens: int = 512,
    overlap: int = 64,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same columns, same rows)."""
    stride = chunk_tokens - overlap
    toks = (
        f"list_filter(string_split_regex({text_col}, '\\s+'), "
        "t -> length(t) > 0)"
    )
    return f"""
        WITH t AS (
            SELECT {id_col}, {toks} AS toks FROM {table}
        ),
        sized AS (
            SELECT {id_col}, toks,
                   CAST(len(toks) AS INT) AS n_tokens,
                   CAST(greatest(1, ceil((len(toks) - {overlap}) /
                        CAST({stride} AS DOUBLE))) AS INT) AS n_chunks
            FROM t WHERE len(toks) > 0
        )
        SELECT {id_col},
               CAST(i AS INT) AS chunk_id,
               n_chunks, n_tokens,
               array_to_string(
                   list_slice(toks, i * {stride} + 1,
                              i * {stride} + {chunk_tokens}), ' ')
                   AS chunk_text
        FROM sized, unnest(generate_series(0, n_chunks - 1)) AS g(i)
    """
