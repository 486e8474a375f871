"""Text-analysis + dedup queries over the documents table.

The training-data-pipeline extension surface (BASELINE.json north star):
token stats, language ID, quality scoring, fingerprint dedup, n-gram
Jaccard, MinHash+LSH, SimHash. Oracle SQL is generated from the same specs
as the Spark expressions (operators.text / operators.dedup `_sql` twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.operators import dedup as D
from nhl_data_pipeline_spark.operators import multimodal as M
from nhl_data_pipeline_spark.operators import text as X
from nhl_data_pipeline_spark.plans.registry import query

_TOKS = "string_split_regex(text, '\\s+')"


@query(
    "text_token_stats",
    covers="LLM-text,token-counting",
    bench=True,
    oracle=f"""
        SELECT doc_id, n_chars,
               CAST(len({_TOKS}) AS INT) AS n_tokens,
               CAST(len(list_distinct({_TOKS})) AS INT) AS n_unique_tokens,
               CAST(length(text) AS INT) AS text_len,
               CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}) AS unique_ratio
        FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical-diversity stats, one pass, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    return d.select(
        "doc_id",
        "n_chars",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.length("text").alias("text_len"),
        X.unique_ratio(F.col("text")).alias("unique_ratio"),
    )


@query(
    "text_lang_quality",
    covers="LLM-text,lang-id,quality-scoring",
    oracle=f"""
        SELECT doc_id, lang,
               {X.lang_id_sql('text')} AS lang_hat,
               CASE WHEN {X.lang_id_sql('text')} = lang THEN TRUE ELSE FALSE END AS agrees,
               {X.quality_score_sql('text')} AS quality,
               CASE WHEN {X.quality_score_sql('text')} >= 0.75 THEN TRUE ELSE FALSE END AS keep
        FROM documents
    """,
)
def text_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation profile: stopword-hit language-ID heuristic vs
    the labeled lang column, plus the quality score (length + non-stopword
    mass + diversity) with its keep threshold. One scan, one projection, all
    JVM higher-order functions — the two signals share the tokenization
    subtree, which Catalyst dedupes via common-subexpression elimination."""
    d = load_table(spark, sf_dir, "documents")
    hat = X.lang_id(F.col("text"))
    q = X.quality_score(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        hat.alias("lang_hat"),
        (hat == F.col("lang")).alias("agrees"),
        q.alias("quality"),
        (q >= 0.75).alias("keep"),
    )


@query(
    "doc_fingerprint_dedup",
    covers="LLM-dedup-exact,A1",
    oracle=f"""
        SELECT {X.fingerprint_sql('text')} AS fp,
               CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM documents
        GROUP BY 1
    """,
)
def doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via canonical fingerprint; keep the smallest doc_id.

    One hash-aggregate shuffle on the 16-byte fingerprint — at 100 TB this
    moves hashes, never documents.
    """
    d = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_keep_min(d, X.fingerprint(F.col("text")), "doc_id")


_SH_SQL = D.shingles_sql(_TOKS, 3)


@query(
    "dedup_ngram_jaccard",
    covers="LLM-dedup-jaccard,F1,J2",
    bench=True,
    oracle=f"""
        WITH shl AS (
            SELECT doc_id, {_SH_SQL} AS sh
            FROM documents WHERE len({_TOKS}) >= 3
        ),
        sh AS (
            SELECT doc_id, CAST(len(sh) AS BIGINT) AS n, unnest(sh) AS s FROM shl
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS n_a, b.n AS n_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
        FROM common
        WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (threshold 0.8).

    Plan shape for scale:
    - the exploded shingle table is produced ENTIRELY in whole-stage
      codegen: posexplode the token array, then lead(tok,1)/lead(tok,2)
      windows over (doc_id, pos) concat consecutive triples. This replaced
      an Arrow-batched pandas-UDF array builder — 3-4× faster here and no
      Python workers at all (the JVM higher-order-function build is
      interpreted, slower still); the shingle count n rides along as a
      frameless windowed COUNT minus 2, so no sizes-aggregate join either;
    - the pair join carries an exact-preserving length prefilter
      (J ≤ min/max, so 4·max(n_a,n_b) ≤ 5·min(n_a,n_b) is implied by
      J ≥ 0.8) that prunes pairs before the groupBy shuffle;
    - shingles are carried as xxhash64 longs, not strings: the join/groupBy
      shuffles move 8-byte keys (~20% faster end-to-end; collision bound
      ~D²/2⁶⁵ — see exploded_distinct_shingles — and the string-keyed
      DuckDB oracle cross-checks the final pairs);
    - the exploded shingle table is persisted: it feeds both join sides —
      one window computation instead of two;
    - at 100 TB additionally drop ultra-frequent shingles pre-join
      (stop-shingles) and/or gate with the MinHash-LSH candidates — this
      exact form is the verifier stage.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = D.exploded_distinct_shingles(
        d, X.tokens(F.col("text")), 3, hash_shingles=True
    ).persist()
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"), "s")
    # shuffle_hash: skips the sort-merge sort on the wide string key (~40%
    # faster here); the per-partition build side is narrow (doc_id, n, s)
    # rows — at larger scale keep shuffle partitions sized so a partition's
    # build side fits executor memory, or drop the hint to fall back to SMJ.
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"), "s").hint(
        "shuffle_hash"
    )
    common = (
        a.join(b, ["s"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (4 * F.greatest("n_a", "n_b") <= 5 * F.least("n_a", "n_b"))
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


_K, _BANDS, _ROWS = 12, 4, 3
_SIG_SQL = D.minhash_signature_sql("sh", _K)
_BKEYS_SQL = D.lsh_band_keys_sql("sig", _BANDS, _ROWS)


@query(
    "dedup_minhash_lsh",
    covers="LLM-dedup-minhash-lsh",
    bench=True,
    oracle=f"""
        WITH shg AS (
            SELECT doc_id, {_SH_SQL} AS sh
            FROM documents WHERE len({_TOKS}) >= 3
        ),
        sigs AS (SELECT doc_id, {_SIG_SQL} AS sig FROM shg),
        bands AS (
            SELECT doc_id, unnest(generate_series(1, {_BANDS})) AS band_idx,
                   unnest({_BKEYS_SQL}) AS band_key
            FROM sigs
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=12) + LSH banding (4 bands × 3 rows) candidate pairs.

    The n²-free near-dup path: docs meet only inside a band bucket, so join
    cost tracks true duplicate density. Band probability: jaccard^3 per
    band, 1-(1-j^3)^4 overall — j=0.9 → 98% recall; the exact-jaccard query
    above is the verify stage downstream.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # Signature via aggregation, not array HOFs: over the codegen-built
    # exploded shingle table, sig[i] is simply MIN(md5('<i>|' || s)) — k
    # plain min aggregates (lexicographic string min ≡ array_min of the
    # md5s, so values are bit-identical to the array formulation and the
    # same oracle applies). The groupBy(doc_id) reuses the shingle stage's
    # doc_id hash partitioning — no exchange — and nothing here leaves
    # whole-stage codegen. Band keys are md5s over plain signature columns
    # (no lambdas → no sibling-collision risk, no interpreted eval).
    sh = D.exploded_distinct_shingles(d, X.tokens(F.col("text")), 3)
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"h{i}")
            for i in range(_K)
        ]
    )
    band_key = lambda b: F.md5(  # noqa: E731
        F.concat_ws("|", *[F.col(f"h{b * _ROWS + r}") for r in range(_ROWS)])
    )
    bands = (
        sigs.select(
            "doc_id",
            F.posexplode(F.array(*[band_key(b) for b in range(_BANDS)])).alias(
                "band_idx0", "band_key"
            ),
        )
        .select("doc_id", (F.col("band_idx0") + 1).alias("band_idx"), "band_key")
        .persist()  # feeds both self-join sides
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


@query(
    "dedup_simhash",
    covers="LLM-dedup-simhash",
    oracle=f"""
        SELECT doc_id, {D.simhash_sql(_TOKS, 16)} AS simhash16
        FROM documents
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (md5-nibble bits, ±1 majority vote).

    Join-free near-dup bucketing: one value per doc, cluster by equality
    (or probe neighboring buckets for Hamming distance ≤ d at scale).
    Computed via the explode + sum-aggregate form (codegen, md5 once per
    token, measured 2.6× over the interpreted array fold — see simhash_exploded).
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return D.simhash_exploded(
        d.select("doc_id", X.tokens(F.col("text")).alias("toks")),
        F.col("toks"),
        16,
    )


@query(
    "multimodal_feature_extract",
    covers="LLM-multimodal,mapInPandas",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS INT) AS n_bytes,
               md5(text) AS content_hash
        FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the Arrow mapInPandas path.

    The payload is a real binary column; the extractor runs per Arrow batch
    exactly as an image/audio featurizer would (decode stays stubbed —
    codec libs absent). The oracle checks the deterministic stand-in
    features (byte length + md5), proving the plumbing end to end.
    """
    d = load_table(spark, sf_dir, "documents")
    return M.extract_features(M.attach_binary_payload(d))


@query(
    "curation_pipeline",
    covers="LLM-curation,composition",
    bench=True,
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {X.lang_id_sql('text')} AS lang_hat,
                   {X.quality_score_sql('text')} AS quality
            FROM documents
        ),
        shl AS (
            SELECT doc_id, {_SH_SQL} AS sh
            FROM documents WHERE len({_TOKS}) >= 3
        ),
        sh AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n, unnest(sh) AS s FROM shl),
        dup_pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS n_a, b.n AS n_b,
                   CAST(count(*) AS BIGINT) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        ),
        drop_docs AS (
            SELECT DISTINCT doc_b AS doc_id FROM dup_pairs
            WHERE CAST(c AS DOUBLE) / (n_a + n_b - c) >= 0.8
        )
        SELECT s.doc_id, s.lang_hat, s.quality
        FROM scored s
        WHERE s.lang_hat = 'en'
          AND s.quality >= 0.75
          AND NOT EXISTS (SELECT 1 FROM drop_docs d WHERE d.doc_id = s.doc_id)
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation filter: language ∧ quality ∧ near-dup removal.

    The composed training-data pipeline stage: keep English docs above the
    quality bar, dropping the higher-id member of every jaccard≥0.8
    near-dup pair (keep-first policy). Composition of the lang-ID, quality
    and jaccard operators — one declarative plan, so Catalyst shares the
    documents scan across branches.
    """
    d = load_table(spark, sf_dir, "documents")
    hat = X.lang_id(F.col("text"))
    q = X.quality_score(F.col("text"))
    scored = d.select("doc_id", hat.alias("lang_hat"), q.alias("quality"))
    drop_docs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        scored.filter((F.col("lang_hat") == "en") & (F.col("quality") >= 0.75))
        .join(drop_docs, "doc_id", "left_anti")
        .select("doc_id", "lang_hat", "quality")
    )
