"""Robust JSON ingest: quarantine split, schema widening, drift census."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from nhl_data_pipeline_spark.sources import robust as R

SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.LongType()),
        T.StructField("team", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _write_mixed(tmp_path):
    p = tmp_path / "feed"
    p.mkdir()
    good = [
        {"game_id": 1, "team": "BOS", "score": 3},
        {"game_id": 2, "team": "NYR", "score": 1},
        {"game_id": 3, "team": None, "score": 2},
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(1, '{"game_id": 4, "team": "TOR", "score": ')  # truncated
    lines.append("not json at all")
    (p / "part-0.json").write_text("\n".join(lines))
    return str(p), good


def test_quarantine_splits_good_and_bad(spark, tmp_path):
    path, good = _write_mixed(tmp_path)
    ok, bad = R.read_json_quarantine(spark, path, SCHEMA)
    got = sorted(
        (r["game_id"], r["team"], r["score"]) for r in ok.collect()
    )
    assert got == [(1, "BOS", 3), (2, "NYR", 1), (3, None, 2)]
    raws = sorted(r["raw"] for r in bad.collect())
    assert len(raws) == 2
    assert "not json at all" in raws[1] or "not json at all" in raws[0]
    assert all(r["source_file"].endswith("part-0.json") for r in bad.collect())


def test_quarantine_keeps_totals(spark, tmp_path):
    path, _ = _write_mixed(tmp_path)
    ok, bad = R.read_json_quarantine(spark, path, SCHEMA)
    assert ok.count() + bad.count() == 5  # nothing silently dropped


def test_quarantine_cache_handle_unpins(spark, tmp_path):
    """The split REQUIRES a cache (corrupt-column workaround); the result
    exposes it so callers can release executor storage — without the
    handle, every corpus read stays pinned for the session lifetime."""
    path, _ = _write_mixed(tmp_path)
    split = R.read_json_quarantine(spark, path, SCHEMA)
    ok, bad = split  # tuple-unpacking form still works
    assert ok.count() + bad.count() == 5
    assert split.cached.storageLevel.useMemory  # pinned while in use
    split.unpersist(blocking=True)
    assert not split.cached.storageLevel.useMemory


def test_schema_union_widens_and_reports():
    old = SCHEMA
    new = T.StructType(
        [
            T.StructField("game_id", T.LongType()),
            T.StructField("team", T.LongType()),  # type conflict
            T.StructField("score", T.DoubleType()),  # numeric widen
            T.StructField("venue", T.StringType()),  # added
        ]
    )
    merged, notes = R.schema_union(old, new)
    by = {f.name: f.dataType for f in merged.fields}
    assert by["game_id"] == T.LongType()
    assert by["team"] == T.StringType()  # conflict -> string
    assert by["score"] == T.DoubleType()  # long+double -> double
    assert by["venue"] == T.StringType()
    assert [f.name for f in merged.fields] == [
        "game_id",
        "team",
        "score",
        "venue",
    ]
    assert any("widened" in n for n in notes)
    assert any("conflict" in n for n in notes)
    assert any("added" in n for n in notes)


def test_schema_union_reader_roundtrip(spark, tmp_path):
    """Old and new batches both parse under the widened schema with zero
    quarantined rows."""
    p = tmp_path / "drift"
    p.mkdir()
    (p / "old.json").write_text(
        '{"game_id": 1, "team": "BOS", "score": 3}\n'
    )
    (p / "new.json").write_text(
        '{"game_id": 2, "team": "NYR", "score": 2.5, "venue": "MSG"}\n'
    )
    new_schema = T.StructType(
        [
            T.StructField("game_id", T.LongType()),
            T.StructField("team", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("venue", T.StringType()),
        ]
    )
    merged, _ = R.schema_union(SCHEMA, new_schema)
    ok, bad = R.read_json_quarantine(spark, str(p), merged)
    assert bad.count() == 0
    rows = {r["game_id"]: r for r in ok.collect()}
    assert rows[1]["score"] == 3.0 and rows[1]["venue"] is None
    assert rows[2]["venue"] == "MSG"


def test_drift_report_census(spark, tmp_path):
    path, _ = _write_mixed(tmp_path)
    ok, _ = R.read_json_quarantine(spark, path, SCHEMA)
    rep = {r["field"]: r for r in R.drift_report(ok).collect()}
    assert rep["game_id"]["n_present"] == 3
    assert rep["team"]["n_present"] == 2
    assert abs(rep["team"]["null_rate"] - 1 / 3) < 1e-12
    assert rep["score"]["type"] == "long"


def test_stream_quarantine_matches_batch_twin(spark, tmp_path):
    """One availableNow pass over the same mixed feed produces exactly the
    batch split (good rows and quarantined raw lines), and a second pass
    with new files is incremental (checkpointed)."""
    path, good = _write_mixed(tmp_path)
    gp, qp, cp = (
        str(tmp_path / "good"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt"),
    )
    R.stream_json_quarantine(spark, path, SCHEMA, gp, qp, cp).awaitTermination(120)
    ok = sorted(
        (r["game_id"], r["team"], r["score"])
        for r in spark.read.parquet(gp).collect()
    )
    assert ok == [(1, "BOS", 3), (2, "NYR", 1), (3, None, 2)]
    assert spark.read.parquet(qp).count() == 2

    # incremental: a new file with one good + one bad line
    import pathlib

    pathlib.Path(path, "part-1.json").write_text(
        '{"game_id": 9, "team": "CHI", "score": 5}\nbroken{\n'
    )
    R.stream_json_quarantine(spark, path, SCHEMA, gp, qp, cp).awaitTermination(120)
    assert spark.read.parquet(gp).count() == 4  # only the new good row added
    q = spark.read.parquet(qp)
    assert q.count() == 3
    # the streaming quarantine carries the batch contract's source_file
    assert {"source_file", "raw"} <= set(q.columns)
    assert all(r["source_file"] for r in q.collect())


def test_stream_quarantine_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME (frame, batch_id)
    — the crash-replay case — must overwrite its own partition, not append
    a duplicate."""
    from pyspark.sql import functions as F

    path, _ = _write_mixed(tmp_path)
    gp, qp = str(tmp_path / "g2"), str(tmp_path / "q2")
    full = R.T.StructType(
        list(SCHEMA.fields)
        + [R.T.StructField(R.CORRUPT_COL, R.T.StringType())]
    )
    frame = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", R.CORRUPT_COL)
        .json(path)
        .select("*", F.input_file_name().alias("_source_file"))
    )
    split = R.quarantine_batch_writer(gp, qp)
    split(frame, 0)
    n_good, n_bad = spark.read.parquet(gp).count(), spark.read.parquet(qp).count()
    split(frame, 0)  # replay
    assert spark.read.parquet(gp).count() == n_good
    assert spark.read.parquet(qp).count() == n_bad


# ---------------------------------------------------- schema_union laws


def _arbitrary_schema(draw):
    from hypothesis import strategies as st

    from pyspark.sql import types as TT

    types = [
        TT.LongType(),
        TT.IntegerType(),
        TT.DoubleType(),
        TT.StringType(),
        TT.BooleanType(),
    ]
    names = draw(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=1, max_size=5, unique=True
        )
    )
    return TT.StructType(
        [
            TT.StructField(n, draw(st.sampled_from(types)), True)
            for n in names
        ]
    )


def test_schema_union_laws():
    """Property: idempotent on itself; result covers every field of both
    inputs; a field's merged type can parse values of BOTH input types
    (same type, widened numeric, or string)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def run(data):
        a = _arbitrary_schema(data.draw)
        b = _arbitrary_schema(data.draw)
        merged, _ = R.schema_union(a, b)
        same, _ = R.schema_union(a, a)
        assert same == T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in a.fields]
        )
        names = {f.name for f in merged.fields}
        assert {f.name for f in a.fields} | {f.name for f in b.fields} == names
        by = {f.name: f.dataType for f in merged.fields}
        for src in (a, b):
            for f in src.fields:
                t = by[f.name]
                ok = (
                    t == f.dataType
                    or t == T.StringType()
                    or (
                        f.dataType.typeName() in ("integer", "long")
                        and t.typeName() in ("long", "double")
                    )
                    or (
                        f.dataType.typeName() == "double"
                        and t.typeName() == "double"
                    )
                )
                assert ok, (f.name, f.dataType, t)
        # merge is stable: merging the merge with either input adds nothing
        again, _ = R.schema_union(merged, a)
        assert {f.name for f in again.fields} == names

    run()


def test_stream_quarantine_bounded_backfill(spark, tmp_path):
    """maxFilesPerTrigger=1 over two files must produce two micro-batch
    partitions — the restartable, memory-bounded catch-up shape."""
    p = tmp_path / "feed3"
    p.mkdir()
    (p / "a.json").write_text('{"game_id": 1, "team": "BOS", "score": 3}\n')
    (p / "b.json").write_text('{"game_id": 2, "team": "NYR", "score": 1}\n')
    gp, qp, cp = (
        str(tmp_path / "g3"),
        str(tmp_path / "q3"),
        str(tmp_path / "c3"),
    )
    R.stream_json_quarantine(
        spark, str(p), SCHEMA, gp, qp, cp, max_files_per_trigger=1
    ).awaitTermination(120)
    out = spark.read.parquet(gp)
    assert out.count() == 2
    assert out.select("_batch_id").distinct().count() == 2
