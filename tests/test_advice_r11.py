"""Round-12 fixes for the five ADVICE r11 findings: the bigq default
stage path derived from a non-local warehouse URI (Spark write and
pyarrow read would hit different filesystems), the per-call stage-dir
leak, refine_over_knee's silent band-key overrun past the available SRP
slices, non-nesting block comments in _split_statements (the PG scanner
nests), and show_all_tables silently dropping tables whose schema
resolution fails.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from quackspark import sqlfront
from quackspark.operators import simsearch
from quackspark.sqlfront import _split_statements


# --- ADVICE r11 medium: bigq default stage vs remote warehouse ----------


def test_stage_root_refuses_remote_warehouse():
    """With a non-local warehouse scheme the default stage would be
    written to the Hadoop default FS but read from the LOCAL fs by the
    executors' pyarrow — the derivation must fail fast instead."""
    with pytest.raises(ValueError, match="stage_path"):
        simsearch._stage_root("hdfs://nn:8020/warehouse")
    with pytest.raises(ValueError, match="stage_path"):
        simsearch._stage_root("s3a://bucket/warehouse")


def test_stage_root_accepts_local_forms():
    assert simsearch._stage_root("/tmp/wh") == "/tmp/wh"
    assert simsearch._stage_root("file:/tmp/wh") == "/tmp/wh"
    assert simsearch._stage_root("file:///tmp/wh") == "/tmp/wh"


def test_bigq_explicit_stage_path_is_caller_owned(spark, tmp_path):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8]), (3, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    stage = str(tmp_path / "qstage")
    before = len(simsearch._BIGQ_STAGES)
    out = simsearch.brute_force_topk_heap_bigq(
        emb, emb, k=1, stage_path=stage
    ).collect()
    assert len(out) == 3
    assert os.path.isdir(stage)  # caller-owned: not auto-removed
    assert len(simsearch._BIGQ_STAGES) == before  # not tracked either


# --- ADVICE r11 low: stage-dir leak + cleanup helper ---------------------


def test_bigq_default_stage_tracked_and_dropped(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id int, embedding array<double>"
    )
    before = len(simsearch._BIGQ_STAGES)
    res = simsearch.brute_force_topk_heap_bigq(emb, emb, k=1)
    assert len(simsearch._BIGQ_STAGES) == before + 1
    stage = simsearch._BIGQ_STAGES[-1]
    assert os.path.isdir(stage)
    res.collect()  # materialize before cleanup — the read is lazy
    removed = simsearch.drop_staged_queries()
    assert stage in removed
    assert not os.path.exists(stage)
    assert len(simsearch._BIGQ_STAGES) == 0 or stage not in simsearch._BIGQ_STAGES


# --- ADVICE r11 low: refine_over_knee rounds overrun ---------------------


def test_refine_over_knee_rounds_overrun_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, [1.0, 0.0], 1.0, "b0")],
        "vec_id int, cluster int, vec array<double>, nrm double, qs_band string",
    )
    max_rounds = (
        simsearch.SEM_SPLIT_PLANES // simsearch.SEM_SPLIT_BITS
        - simsearch._SEM_SPLIT_FIRST_BAND
    )
    with pytest.raises(ValueError, match="rounds"):
        simsearch.refine_over_knee(df, rounds=max_rounds + 1)
    # at the limit the key indices stay in range — plan must build
    simsearch.refine_over_knee(df, rounds=max_rounds).schema


# --- ADVICE r11 low: nested block comments -----------------------------


def test_split_statements_nested_block_comment():
    """PG scanner (and DuckDB) nest /* */ — a ';' inside the outer
    comment is text. Pinned live: duckdb runs the whole script as one
    statement."""
    script = "SELECT 1 AS a /* x /* y */ ; still comment */; SELECT 2 AS b"
    parts = _split_statements(script)
    assert len(parts) == 2
    assert parts[0].startswith("SELECT 1")
    assert parts[1] == "SELECT 2 AS b"
    # live-oracle pin: the nested form is one statement to DuckDB
    assert duckdb.sql(parts[0]).fetchall() == [(1,)]


def test_split_statements_unterminated_nested_comment():
    parts = _split_statements("SELECT 1 /* a /* b */ never closed ;")
    assert len(parts) == 1


def test_split_statements_plain_comment_still_splits():
    parts = _split_statements("SELECT 1 /* c */; SELECT 2")
    assert len(parts) == 2


def test_nested_comment_through_sql_front(spark):
    out = sqlfront.sql(
        spark, "SELECT 1 AS a /* o /* i */ ; o */; SELECT 42 AS v"
    ).collect()
    assert out[0]["v"] == 42


# --- ADVICE r11 low: show_all_tables keeps dangling views ---------------


def test_show_all_tables_keeps_unresolvable_view(spark):
    from quackspark import catalog

    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView(
        "adv11_base"
    )
    spark.sql("CREATE OR REPLACE TEMP VIEW adv11_dangle AS SELECT * FROM adv11_base")
    spark.catalog.dropTempView("adv11_base")
    try:
        rows = {r["name"]: r for r in catalog.show_all_tables(spark).collect()}
        assert "adv11_dangle" in rows
        assert rows["adv11_dangle"]["column_names"] == []
    finally:
        spark.catalog.dropTempView("adv11_dangle")
