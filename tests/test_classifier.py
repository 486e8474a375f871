"""Linear quality-classifier inference: DuckDB twin parity (exact logits)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.operators.classifier import (
    classifier_score,
    classifier_score_sql,
    demo_weights,
    hashed_token_features,
)
from tests.conftest import TEST_SF_DIR


def test_matches_duckdb_twin(spark, duck):
    docs = load_table(spark, TEST_SF_DIR, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["logit"], r["keep"], r["prob"])
        for r in classifier_score(docs, demo_weights(spark), bias="0.25").collect()
    }
    want = {
        r[0]: (Decimal(str(r[1])), r[3], r[2])
        for r in duck.sql(classifier_score_sql(bias="0.25")).fetchall()
    }
    assert set(got) == set(want) and len(got) > 0
    for k, (logit, keep, prob) in got.items():
        wl, wk, wp = want[k]
        assert logit == wl, (k, logit, wl)  # exact decimal, bit-for-bit
        assert keep == wk
        assert abs(prob - wp) < 1e-12  # sigmoid is the one double step


def test_bias_shifts_logits_exactly(spark):
    docs = (
        load_table(spark, TEST_SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    w = demo_weights(spark)
    z0 = {r["doc_id"]: r["logit"] for r in classifier_score(docs, w).collect()}
    z1 = {
        r["doc_id"]: r["logit"]
        for r in classifier_score(docs, w, bias="10").collect()
    }
    assert all(z1[k] - z0[k] == Decimal(10) for k in z0)


def test_hashed_features_partition_token_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "  x  "), (3, "")],
        "doc_id: bigint, text: string",
    )
    rows = hashed_token_features(docs).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        assert len(r["bucket"]) == 3
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["tf"]
    assert per_doc == {1: 4, 2: 1}  # tf sums to token count; empty doc absent


def test_sparse_weights_default_zero(spark):
    """Buckets missing from the weight table contribute 0 (left join)."""
    docs = spark.createDataFrame([(1, "hello world")], "doc_id: bigint, text: string")
    empty_w = spark.createDataFrame(
        [], "bucket: string, weight: decimal(12,6)"
    )
    rows = classifier_score(docs, empty_w, bias="0.5").collect()
    assert len(rows) == 1 and rows[0]["logit"] == Decimal("0.5")


def test_logit_matches_python_reference(spark):
    """Independent-reference parity: per-doc logit equals the plain-Python
    sum of md5-bucket weights over tokens (same stand-in weight
    derivation), computed entirely outside Spark."""
    import hashlib
    from decimal import Decimal

    docs_rows = [
        (1, "the quick brown fox"),
        (2, "the the the"),
        (3, "lorem ipsum dolor sit amet"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id: bigint, text: string")

    def bucket(tok: str) -> str:
        return hashlib.md5(tok.encode()).hexdigest()[:3]

    def weight(b: str) -> Decimal:
        h = int(hashlib.md5(f"w|{b}".encode()).hexdigest()[:6], 16)
        return (Decimal(h - 8388608) / 1000000).quantize(Decimal("0.000001"))

    got = {
        r["doc_id"]: r["logit"]
        for r in classifier_score(docs, demo_weights(spark)).collect()
    }
    for doc_id, text in docs_rows:
        want = sum((weight(bucket(t)) for t in text.split()), Decimal(0))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


# ------------------------------------------------------------- training


def _train_docs():
    """Planted-signal corpus: positives carry 'excellent prose tokens',
    negatives carry 'spammy junk tokens'; shared filler in both."""
    rows = []
    for i in range(30):
        rows.append((i, f"filler{i % 5} common words excellent prose quality", 1))
    for i in range(30, 60):
        rows.append((i, f"filler{i % 5} common words spammy junk noise", 0))
    return rows


def _py_train_logreg(rows, n_iter=5, lr=0.5, l2=0.0):
    """Plain-Python reference: same md5 buckets, same DECIMAL(12,6)
    weights, same 1e-9 error truncation, same update arithmetic."""
    import hashlib
    import math
    from decimal import ROUND_DOWN, Decimal

    from nhl_data_pipeline_spark.operators.classifier import (
        BIAS_BUCKET,
        ERR_FIXED,
    )

    def bucket(tok):
        return hashlib.md5(tok.encode()).hexdigest()[:3]

    feats = {}  # doc -> {bucket: tf}
    ys = {}
    for doc_id, text, y in rows:
        tf = {BIAS_BUCKET: 1}
        for t in text.split():
            if t:
                tf[bucket(t)] = tf.get(bucket(t), 0) + 1
        feats[doc_id] = tf
        ys[doc_id] = float(y)
    buckets = sorted({b for tf in feats.values() for b in tf})
    w = {b: Decimal(0) for b in buckets}
    n = len(rows)

    def q6(x):
        return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_DOWN)

    for _ in range(n_iter):
        g = {b: 0 for b in buckets}
        for doc_id, tf in feats.items():
            logit = sum((w[b] * c for b, c in tf.items()), Decimal(0))
            err = 1.0 / (1.0 + math.exp(-float(logit))) - ys[doc_id]
            err_f = int(err * ERR_FIXED)  # truncates toward zero
            for b, c in tf.items():
                g[b] += err_f * c
        w = {
            b: q6(
                float(w[b])
                * (1.0 if b == BIAS_BUCKET else (1.0 - lr * l2))
                - lr * (g[b] / ERR_FIXED) / n
            )
            for b in buckets
        }
    bias = w.pop(BIAS_BUCKET)
    return w, bias


def test_train_logreg_learns_planted_signal(spark):
    from nhl_data_pipeline_spark.operators.classifier import train_logreg

    rows = _train_docs()
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string, y: int")
    wdf, bias = train_logreg(docs, label_col="y", n_iter=6)
    scored = {
        r["doc_id"]: r["prob"]
        for r in classifier_score(docs, wdf, bias).collect()
    }
    pos = [scored[i] for i in range(30)]
    neg = [scored[i] for i in range(30, 60)]
    assert min(pos) > max(neg)  # perfect separation on the planted signal
    assert min(pos) > 0.5 > max(neg)


def test_train_logreg_matches_python_reference(spark):
    """Cross-engine parity. Exact decimal margins + fixed-point gradients
    make the trajectory identical up to the one float stage (libm exp in
    JVM vs CPython) — weights agree to ~1e-6 (the re-quantization grid)."""
    from nhl_data_pipeline_spark.operators.classifier import train_logreg

    rows = _train_docs()
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string, y: int")
    wdf, bias = train_logreg(docs, label_col="y", n_iter=4)
    got = {r["bucket"]: r["weight"] for r in wdf.collect()}
    want, want_bias = _py_train_logreg(rows, n_iter=4)
    assert set(got) == set(want)
    for b in want:
        assert abs(float(got[b]) - float(want[b])) <= 2e-6, (
            b,
            got[b],
            want[b],
        )
    assert abs(float(bias) - float(want_bias)) <= 2e-6


def test_train_logreg_partitioning_invariant(spark):
    """EXACT equality under repartitioning: every distributed sum is
    decimal/fixed-point, so reduction order cannot change a bit."""
    from nhl_data_pipeline_spark.operators.classifier import train_logreg

    rows = _train_docs()
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string, y: int")
    w1, b1 = train_logreg(docs, label_col="y", n_iter=3)
    w2, b2 = train_logreg(docs.repartition(13), label_col="y", n_iter=3)
    assert b1 == b2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))


def test_train_logreg_l2_decays_weights_not_bias(spark):
    """With L2 on, the Python-reference parity must still hold (exercises
    the decay path) and the intercept must NOT be regularized."""
    from nhl_data_pipeline_spark.operators.classifier import train_logreg

    rows = _train_docs()
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string, y: int")
    wdf, bias = train_logreg(docs, label_col="y", n_iter=3, l2=0.2)
    got = {r["bucket"]: r["weight"] for r in wdf.collect()}
    want, want_bias = _py_train_logreg(rows, n_iter=3, l2=0.2)
    for b in want:
        assert abs(float(got[b]) - float(want[b])) <= 2e-6
    assert abs(float(bias) - float(want_bias)) <= 2e-6
    # the decayed run shrinks feature weights vs the unregularized run,
    # but the bias stays on the unregularized trajectory's scale
    w0, b0 = train_logreg(docs, label_col="y", n_iter=3, l2=0.0)
    mag = lambda df: sum(  # noqa: E731
        abs(float(r["weight"])) for r in df.collect()
    )
    assert mag(wdf) < mag(w0)
    assert abs(float(bias)) >= 0.5 * abs(float(b0))
