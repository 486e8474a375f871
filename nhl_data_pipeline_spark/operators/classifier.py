"""Linear quality-classifier INFERENCE at corpus scale.

The model-based curation stage (fastText/CCNet-style "wiki vs crawl"
quality filters): a trained linear model over hashed bag-of-words
features, applied to every document. Training such a model is a
single-node / MLlib job over a small labeled set and is out of scope —
what a 100 TB pipeline needs from the ENGINE is cheap, deterministic,
resumable inference, which is exactly a broadcast join plus one
aggregation:

  features:  explode tokens → md5-prefix bucket (portable hash) →
             per-(doc, bucket) term frequency. One shuffle, reusable
             doc_id partitioning.
  score:     broadcast the (bucket, weight) table — 2^k rows however big
             the corpus — multiply-accumulate per doc, add bias.
  decision:  logit > 0 (sigmoid is monotone; prob column is convenience).

Cross-engine determinism: weights are DECIMAL(12,6) and term frequencies
BIGINT, so every product and the per-doc sum are EXACT decimal
arithmetic — the logit matches the DuckDB twin bit-for-bit (same rule as
operators/lm.py: keep the hot path in integers/decimals, spend doubles
only on the final monotone transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.operators.text import tokens

BUCKET_HEX = 3  # md5-prefix nibbles -> 4096 buckets


def _bucket(col: F.Column) -> F.Column:
    return F.substring(F.md5(col), 1, BUCKET_HEX)


def hashed_token_features(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, bucket, tf) hashed bag-of-words. Bucket = first 3 md5 hex
    chars of the token (4096 buckets) — portable to any engine, unlike
    xxhash64/murmur. Collisions are the point (hashing trick)."""
    tok = docs.select(
        id_col,
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
        ).alias("_t"),
    )
    return tok.groupBy(id_col, _bucket(F.col("_t")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("tf")
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    bias: str = "0",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, logit, prob, keep) — logit exact DECIMAL, keep = logit > 0.

    ``weights``: (bucket string, weight DECIMAL(12,6)) — broadcast (≤ 4096
    rows). ``bias``: decimal string literal so the addition stays exact.
    Buckets without weights contribute 0 (left join), mirroring a sparse
    model. The per-doc aggregation reuses the feature groupBy's id
    partitioning — one exchange end-to-end on the corpus side.
    """
    feats = hashed_token_features(docs, id_col=id_col, text_col=text_col)
    scored = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            (
                F.sum(
                    F.coalesce(F.col("weight"), F.lit(0).cast("decimal(12,6)"))
                    * F.col("tf")
                )
                + F.expr(f"CAST({bias} AS DECIMAL(20,6))")
            ).alias("logit")
        )
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit").cast("double")))
    return scored.select(
        id_col,
        F.col("logit").cast("decimal(38,6)").alias("logit"),
        p.alias("prob"),
        (F.col("logit") > 0).alias("keep"),
    )


_HEX = "0123456789abcdef"


def _hex6_int_sql(expr: str) -> str:
    """First-6-hex-chars-of-md5 → integer, in SQL text valid in BOTH Spark
    SQL and DuckDB (instr nibble lookup — same trick as simhash_sql)."""
    terms = " + ".join(
        f"(instr('{_HEX}', substring(md5({expr}), {j + 1}, 1)) - 1) "
        f"* {16 ** (5 - j)}"
        for j in range(6)
    )
    return f"CAST({terms} AS BIGINT)"


def _demo_weight_sql(bucket_expr: str) -> str:
    """Deterministic stand-in weight for a bucket: md5-derived integer in
    [0, 2^24) centered to ±8.388608, exact DECIMAL(12,6)."""
    h = _hex6_int_sql(f"'w|' || {bucket_expr}")
    # intermediate needs 7 integer digits (|h - 2^23| < 8388608)
    return f"CAST(CAST({h} - 8388608 AS DECIMAL(14,6)) / 1000000 AS DECIMAL(12,6))"


def demo_weights(spark) -> DataFrame:
    """Deterministic stand-in model: weight(bucket) derived from md5 of the
    bucket id, centered on zero — exercises the full inference path
    without shipping a trained artifact (same policy as the multimodal
    stand-in codecs). Real use: load trained weights from parquet."""
    return (
        spark.range(0, 16**BUCKET_HEX)
        .select(
            F.lpad(F.lower(F.expr("hex(id)")), BUCKET_HEX, "0").alias("bucket")
        )
        .select("bucket", F.expr(_demo_weight_sql("bucket")).alias("weight"))
    )


def classifier_score_sql(
    bias: str = "0",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of demo_weights + classifier_score (exact logits)."""
    toks = (
        f"list_filter(string_split_regex({text_col}, '\\s+'), "
        "t -> length(t) > 0)"
    )
    bucket = f"lpad(lower(to_hex(i)), {BUCKET_HEX}, '0')"
    return f"""
        WITH w AS (
            SELECT {bucket} AS bucket,
                   {_demo_weight_sql(bucket)} AS weight
            FROM unnest(generate_series(0, {16**BUCKET_HEX - 1})) AS t(i)
        ),
        feats AS (
            SELECT {id_col},
                   substr(md5(t), 1, {BUCKET_HEX}) AS bucket,
                   CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT {id_col}, unnest({toks}) AS t FROM {table})
            GROUP BY 1, 2
        ),
        logits AS (
            SELECT f.{id_col},
                   sum(COALESCE(w.weight, 0) * f.tf)
                       + CAST({bias} AS DECIMAL(20,6)) AS logit
            FROM feats f LEFT JOIN w USING (bucket)
            GROUP BY 1
        )
        SELECT {id_col},
               CAST(logit AS DECIMAL(38,6)) AS logit,
               1.0 / (1.0 + exp(-CAST(logit AS DOUBLE))) AS prob,
               logit > 0 AS keep
        FROM logits
    """


def train_score_sql(
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    train_max_id: int = 256,
) -> str:
    """DuckDB twin of ONE-iteration :func:`train_logreg` (zero init,
    lr=0.5, y = id % 2, training subset id < ``train_max_id``) feeding
    :func:`classifier_score` over the full table — exact to the BIT, by
    construction:

    At iteration 1 every weight is 0, so sigmoid(logit)=0.5 EXACTLY and
    the 10⁻⁹-fixed-point error is ±5·10⁸ exactly; the per-bucket gradient
    is therefore 5·10⁸·m with m = Σ(1−2y)·tf an integer. The driver-side
    update w = q6(−lr·(g/10⁹)/n) then runs entirely on exactly-
    representable floats when n is a power of two: g/10⁹ = m/2 (exact),
    ×0.5 = m/4 (exact), /256 = m/1024 (exact — dyadic rational), and the
    6-dp truncation of ±m/1024 is ∓⌊|m|·15625/16⌋ µ — pure integer
    arithmetic, replicated below with no floating point at all. That is
    WHY train_max_id must stay 256 (or another power of two ≤ the doc-id
    range): any other subset size makes the /n division round and the
    truncation engine-sensitive at 10⁻⁶ boundaries.

    Output: (id, logit-as-double via the varchar bridge, keep). ``prob``
    is deliberately absent — it goes through libm exp, whose last ulp is
    engine-specific (train_logreg docstring), while logit and its sign
    are exact.
    """
    toks = (
        f"list_filter(string_split_regex({text_col}, '\\s+'), "
        "t -> length(t) > 0)"
    )
    return f"""
        WITH tr AS (
            SELECT {id_col}, {text_col},
                   CAST({id_col} % 2 AS BIGINT) AS y
            FROM {table} WHERE {id_col} < {train_max_id}
        ),
        tf_tr AS (
            SELECT {id_col},
                   substr(md5(t), 1, {BUCKET_HEX}) AS bucket,
                   CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT {id_col}, unnest({toks}) AS t FROM tr)
            GROUP BY 1, 2
        ),
        m_b AS (
            SELECT bucket, SUM((1 - 2 * tr.y) * tf_tr.tf) AS m
            FROM tf_tr JOIN tr USING ({id_col})
            GROUP BY 1
        ),
        m_bias AS (SELECT SUM(1 - 2 * y) AS m FROM tr),
        w AS (
            SELECT bucket,
                   CAST(CAST(CASE WHEN m >= 0 THEN -((m * 15625) // 16)
                                  ELSE ((-m) * 15625) // 16 END
                             AS DECIMAL(14,0))
                        * CAST(0.000001 AS DECIMAL(8,6))
                        AS DECIMAL(12,6)) AS weight
            FROM m_b
        ),
        bias AS (
            SELECT CAST(CAST(CASE WHEN m >= 0 THEN -((m * 15625) // 16)
                                  ELSE ((-m) * 15625) // 16 END
                            AS DECIMAL(14,0))
                        * CAST(0.000001 AS DECIMAL(8,6))
                        AS DECIMAL(20,6)) AS b
            FROM m_bias
        ),
        feats AS (
            SELECT {id_col},
                   substr(md5(t), 1, {BUCKET_HEX}) AS bucket,
                   CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT {id_col}, unnest({toks}) AS t FROM {table})
            GROUP BY 1, 2
        ),
        logits AS (
            SELECT f.{id_col},
                   sum(COALESCE(w.weight, 0) * f.tf)
                       + (SELECT b FROM bias) AS logit
            FROM feats f LEFT JOIN w USING (bucket)
            GROUP BY 1
        )
        SELECT {id_col},
               CAST(CAST(CAST(logit AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
                   AS logit,
               logit > 0 AS keep
        FROM logits
    """


# ------------------------------------------------------------- training

BIAS_BUCKET = "_b_"  # 3-hex feature buckets can never collide with this
ERR_FIXED = 1_000_000_000  # error quantization: 10^-9


def train_logreg(
    docs: DataFrame,
    *,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_iter: int = 5,
    lr: float = 0.5,
    l2: float = 0.0,
) -> tuple[DataFrame, str]:
    """Distributed logistic-regression training over hashed features —
    the missing half of :func:`classifier_score` (which consumes the
    (bucket, weight) table this produces). Returns ``(weights_df, bias)``
    ready to feed straight into ``classifier_score(docs, weights_df,
    bias)``.

    Batch gradient descent, the k-means execution pattern: per iteration
    ONE corpus-scale pass; the model (≤ 4096 weights + bias, a few KB)
    lives on the driver and broadcasts back as a literal-sized table.

    Per iteration:
      margins: feats ⋈ broadcast(weights) on bucket, then a per-doc sum —
               EXACT decimal arithmetic (weights DECIMAL(12,6) × tf
               BIGINT), so the logit is partitioning-invariant to the bit.
      error:   sigmoid(logit) − y in float64, then TRUNCATED to 10⁻⁹
               fixed-point BIGINT — from here on every sum is exact
               integer/decimal again, so gradients (and therefore the
               whole training trajectory) are identical under any
               partitioning or reduction order.
      gradient: feats ⋈ error on the id (both sides carry the feature
               build's id-hash partitioning — no extra exchange), then
               groupBy bucket with a DECIMAL(38,0) sum: 4096 partial rows
               per partition, map-side combined.
      update:  driver-side w ← w·(1−lr·l2) − lr·g/n, re-quantized to
               DECIMAL(12,6) (truncation) before re-broadcast.

    The label rides INSIDE the feature table (one extra groupBy key of a
    doc-constant) — no per-iteration label join. The bias is just one
    more feature row per doc (tf=1, bucket='_b_'), so the same gradient
    machinery trains it; it is returned separately because inference
    features never contain the bias bucket.

    Float caveat, stated honestly: sigmoid goes through libm exp, which
    is not correctly rounded — JVM vs numpy can differ in the last ulp,
    so cross-ENGINE parity is asserted to 1e-6 (tests), while
    cross-PARTITIONING equality within Spark is exact by construction.

    Reference analog: none (the reference ships no ML); this extends its
    curation surface the way demo_weights documents — SURVEY §8.
    """
    from decimal import ROUND_DOWN, Decimal

    spark = docs.sparkSession
    feats = hashed_token_features(docs, id_col=id_col, text_col=text_col)
    bias_rows = docs.select(
        F.col(id_col),
        F.lit(BIAS_BUCKET).alias("bucket"),
        F.lit(1).cast("bigint").alias("tf"),
    )
    labels = docs.select(
        F.col(id_col), F.col(label_col).cast("double").alias("_y")
    )
    feats = (
        feats.unionByName(bias_rows)
        .join(labels, id_col)
        .persist()
    )
    n_docs = docs.count()
    buckets = [r["bucket"] for r in feats.select("bucket").distinct().collect()]
    w: dict[str, Decimal] = {b: Decimal(0) for b in buckets}

    def q6(x: float) -> Decimal:
        return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_DOWN)

    for _ in range(n_iter):
        wdf = spark.createDataFrame(
            [(b, w[b]) for b in buckets], "bucket string, weight decimal(12,6)"
        )
        err = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col, "_y")
            .agg(F.sum(F.col("weight") * F.col("tf")).alias("_logit"))
            .select(
                id_col,
                (
                    (
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.col("_logit").cast("double")))
                        - F.col("_y")
                    )
                    * ERR_FIXED
                )
                .cast("bigint")  # truncation toward zero, like numpy trunc
                .alias("_err_f"),
            )
        )
        grads = (
            feats.join(err, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(
                    (F.col("_err_f") * F.col("tf")).cast("decimal(38,0)")
                ).alias("_g")
            )
            .collect()
        )
        g = {r["bucket"]: int(r["_g"]) for r in grads}
        # Standard LR regularizes WEIGHTS, never the intercept — decaying
        # the bias would pull learned probabilities away from the class
        # base rate on imbalanced corpora.
        w = {
            b: q6(
                float(w[b])
                * (1.0 if b == BIAS_BUCKET else (1.0 - lr * l2))
                - lr * (g.get(b, 0) / ERR_FIXED) / n_docs
            )
            for b in buckets
        }

    feats.unpersist()
    bias = w.pop(BIAS_BUCKET, Decimal(0))
    weights_df = spark.createDataFrame(
        sorted(w.items()), "bucket string, weight decimal(12,6)"
    )
    return weights_df, str(bias)
