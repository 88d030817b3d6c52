"""Chunker semantics vs the reference's own unit tests
(src/chunking/sliding_window.rs:119-171)."""

from pyspark.sql import functions as F

from rust_triplets_spark.operators.chunking import ChunkingStrategy, chunk_sections


def _sections(spark, texts):
    return spark.createDataFrame(
        [(f"r{i}", 0, t) for i, t in enumerate(texts)],
        "record_id string, section_idx int, text string",
    )


SMALL = ChunkingStrategy(
    max_window_tokens=4, overlap_tokens=(1,), summary_fallback_tokens=2,
    summary_fallback_weight=0.3, chunk_weight_floor=0.0,
)


def test_reference_case_seven_tokens(spark):
    """7 tokens, window 4, overlap 1, fallback 2 ⇒ 2 windows + 1 summary
    (sliding_window.rs:154-172)."""
    out = chunk_sections(_sections(spark, ["one two three four five six seven"]), SMALL)
    rows = {(r["view_kind"], r["win_index"]): r for r in out.collect()}
    windows = [k for k in rows if k[0] == "window"]
    summaries = [k for k in rows if k[0] == "summary"]
    assert len(windows) == 2 and len(summaries) == 1
    assert rows[("window", 0)]["chunk_text"] == "one two three four"
    assert rows[("window", 1)]["chunk_text"] == "four five six seven"
    assert rows[("summary", None)]["chunk_text"] == "one two"


def test_fitting_section_is_single_window_with_original_text(spark):
    out = chunk_sections(_sections(spark, ["  a   b  "]), SMALL).collect()
    assert len(out) == 1
    r = out[0]
    assert r["view_kind"] == "window" and r["win_index"] == 0 and r["overlap"] == 0
    # whole-section chunk keeps the ORIGINAL text (sliding_window.rs:43-58)
    assert r["chunk_text"] == "  a   b  "
    assert r["tokens_estimate"] == 2


def test_empty_section_produces_no_chunks(spark):
    out = chunk_sections(_sections(spark, ["", "   "]), SMALL)
    assert out.count() == 0


def test_short_final_window(spark):
    """9 tokens, window 4, stride 3 ⇒ windows at 0,3,6 (last is 3 tokens)."""
    out = chunk_sections(_sections(spark, ["t1 t2 t3 t4 t5 t6 t7 t8 t9"]), SMALL)
    wins = sorted(
        [r for r in out.collect() if r["view_kind"] == "window"],
        key=lambda r: r["win_index"],
    )
    assert [w["tokens_estimate"] for w in wins] == [4, 4, 3]
    assert wins[2]["chunk_text"] == "t7 t8 t9"


def test_multi_overlap_configs(spark):
    strat = ChunkingStrategy(
        max_window_tokens=4, overlap_tokens=(1, 2), summary_fallback_tokens=0,
    )
    out = chunk_sections(_sections(spark, ["a b c d e f g h"]), strat)
    by_overlap = (
        out.groupBy("overlap").count().orderBy("overlap").collect()
    )
    # overlap 1 → stride 3 → ceil(4/3)+1 = 3 windows; overlap 2 → stride 2 → 3 windows
    assert [(r["overlap"], r["count"]) for r in by_overlap] == [(1, 3), (2, 3)]


def test_chunk_keys_unique_per_overlap(spark):
    out = chunk_sections(_sections(spark, ["a b c d e f g"]), SMALL)
    keys = [r["chunk_key"] for r in out.collect()]
    assert len(keys) == len(set(keys))
    assert all(k.startswith("r0|0|") for k in keys)
