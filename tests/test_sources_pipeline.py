"""Sources → canonical records → pipeline → batches (SURVEY M6 scope)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.operators.chunking import ChunkingStrategy
from rust_triplets_spark.plans.batches import Checkpoint, batch_iterator, epoch_batches
from rust_triplets_spark.plans.ml_pipeline import ingest_pipeline
from rust_triplets_spark.schema import RECORD_SCHEMA, explode_sections
from rust_triplets_spark.sources.csv_source import (
    CsvSourceConfig,
    default_triplet_recipes,
    read_csv_records,
)
from rust_triplets_spark.sources.file_source import FileSourceConfig, read_file_records
from rust_triplets_spark.sources.hf_source import HfSourceConfig, parse_source_line, read_hf_records
from rust_triplets_spark.sources.in_memory import in_memory_records


def test_csv_role_mode(spark):
    d = tempfile.mkdtemp(prefix="csv_")
    try:
        path = os.path.join(d, "qna.csv")
        with open(path, "w") as f:
            f.write("Question,Answer\n")  # case-insensitive lookup
            f.write("What is  Spark?,A  cluster engine\n")
            f.write(",missing question\n")
            f.write("missing answer,\n")
            f.write("  q2 ok ,a2 ok\n")
        cfg = CsvSourceConfig(source_id="qna", path=path,
                              anchor_column="question", positive_column="answer")
        recs = read_csv_records(spark, cfg)
        assert [(f.name, f.dataType.simpleString()) for f in recs.schema] == [
            (f.name, f.dataType.simpleString()) for f in RECORD_SCHEMA
        ]  # names+types match the canonical shape (nullability may differ)
        rows = {r["id"]: r for r in recs.collect()}
        assert len(rows) == 2  # empty-field rows skipped
        r0 = rows["qna::row_0"]
        assert r0["sections"][0]["role"] == "anchor"
        assert r0["sections"][0]["text"] == "What is Spark?"  # ws normalized
        assert r0["sections"][1]["text"] == "A cluster engine"
        assert abs(r0["trust"] - 0.85) < 1e-6 and r0["taxonomy"] == ["qna"]
        names = [r.name for r in default_triplet_recipes(cfg)]
        assert "csv_anchor_positive_wrong_article" in names
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_csv_multisplit_ids_stable(spark):
    """The positional-id contract under a MULTI-SPLIT file scan (r10
    advice #3): with maxPartitionBytes forced low enough that the CSV
    splits into several scan partitions, (a) two reads of the same file
    agree id-for-id, and (b) ids are true file positions — row_i carries
    the i-th data line — because Spark enumerates a file's splits in
    offset order and monotonically_increasing_id is monotone in
    (partition id, row position)."""
    d = tempfile.mkdtemp(prefix="csv_split_")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        path = os.path.join(d, "big.csv")
        n = 5000
        with open(path, "w") as f:
            f.write("text\n")
            for i in range(n):
                f.write(f"line {i} {'x' * 40}\n")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        cfg = CsvSourceConfig(source_id="big", path=path, text_column="text")
        # the id window shuffles to one partition per file, so split-ness
        # must be asserted on the raw SCAN, not the windowed result
        n_parts = (
            spark.read.option("header", True).csv(path).rdd.getNumPartitions()
        )
        assert n_parts > 4, f"fixture did not split ({n_parts} partitions)"
        first = read_csv_records(spark, cfg)
        got1 = {
            r["id"]: r["sections"][0]["text"]
            for r in first.collect()
        }
        got2 = {
            r["id"]: r["sections"][0]["text"]
            for r in read_csv_records(spark, cfg).collect()
        }
        assert got1 == got2  # re-read equality
        for i in (0, 1, 2499, n - 1):  # positional truth
            assert got1[f"big::row_{i}"].startswith(f"line {i} ")
        assert len(got1) == n
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        shutil.rmtree(d, ignore_errors=True)


def test_csv_text_mode_simcse(spark):
    d = tempfile.mkdtemp(prefix="csv_")
    try:
        path = os.path.join(d, "corpus.csv")
        with open(path, "w") as f:
            f.write("text\nsome corpus line\n\nanother line\n")
        cfg = CsvSourceConfig(source_id="corpus", path=path, text_column="text")
        recs = read_csv_records(spark, cfg).collect()
        assert all(
            r["sections"][0]["text"] == r["sections"][1]["text"] for r in recs
        )  # SimCSE anchor == context
        assert default_triplet_recipes(cfg)[0].allow_same_anchor_positive
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_file_source_tree(spark):
    d = tempfile.mkdtemp(prefix="fsrc_")
    try:
        os.makedirs(f"{d}/source_a/2024-01-05")
        with open(f"{d}/source_a/2024-01-05/Big_News_Today.txt", "w") as f:
            f.write("the body text of the article")
        with open(f"{d}/source_a/2024-01-05/ignore.md", "w") as f:
            f.write("not a txt file")
        recs = read_file_records(spark, FileSourceConfig(source_id="fs", root=d)).collect()
        assert len(recs) == 1
        r = recs[0]
        assert r["id"] == "fs::source_a/2024-01-05/Big_News_Today.txt"
        assert r["sections"][0]["text"] == "Big News Today"  # stem → spaces
        assert r["sections"][1]["text"] == "the body text of the article"
        assert "date=2024-01-05" in r["taxonomy"]
        assert "source_a" in r["taxonomy"]
        # file_times: updated_at = FS modification time; created_at falls
        # back publication-dir date → mtime
        assert r["updated_at"] is not None
        assert r["created_at"].date().isoformat() == "2024-01-05"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hf_source_line_parser():
    cfg = parse_source_line(
        "hf://org/ds/cfg/train anchor=q|question positive=answer context=ctx id=doc_id trust=0.9"
    )
    assert cfg.dataset == "org/ds" and cfg.config == "cfg" and cfg.split == "train"
    assert cfg.anchor_candidates == ("q", "question")
    assert cfg.context_columns == ("ctx",)
    assert cfg.trust == 0.9
    assert cfg.source_id == "hf_org_ds_cfg_train"
    with pytest.raises(ValueError):
        parse_source_line("s3://bucket/x")
    with pytest.raises(ValueError):
        parse_source_line("hf://org/ds bogus=1")


def test_hf_source_read_with_label_map_and_required_context(spark):
    d = tempfile.mkdtemp(prefix="hf_")
    try:
        df = spark.createDataFrame(
            [
                ("d1", "why?", "because", "ctx text", 2),
                ("d2", "how?", "like so", None, 0),  # missing ctx → dropped
                ("d3", "", "fallback q used", "ctx2", 1),  # empty anchor cand
            ],
            "doc_id string, q string, answer string, ctx string, label int",
        )
        df.write.mode("overwrite").parquet(f"{d}/snap")
        cfg = HfSourceConfig(
            dataset="org/ds", split="train", path=f"{d}/snap",
            id_column="doc_id",
            anchor_candidates=("q", "answer"),
            positive_candidates=("answer",),
            context_columns=("ctx",),
            label_maps={"label": ["negative", "neutral", "positive"]},
        )
        rows = {r["id"]: r for r in read_hf_records(spark, cfg).collect()}
        assert set(rows) == {
            "hf_org_ds_train::d1", "hf_org_ds_train::d3"
        }
        # d3's anchor fell back to the second candidate
        assert rows["hf_org_ds_train::d3"]["sections"][0]["text"] == "fallback q used"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_in_memory_and_pipeline_end_to_end(spark):
    recs = in_memory_records(
        spark, "mem",
        [
            {"id": f"mem::{i}",
             "sections": [{"role": "context", "text": " ".join(f"w{i}x{j}" for j in range(12))}]}
            for i in range(30)
        ],
    )
    sections = explode_sections(recs)
    pipe = ingest_pipeline(
        seed=42, strategy=ChunkingStrategy(max_window_tokens=5, overlap_tokens=(1,),
                                           summary_fallback_tokens=2),
        denoise=False,
    )
    chunks = pipe.fit(sections).transform(sections)
    assert chunks.count() > 60
    assert set(chunks.select("split").distinct().toPandas()["split"]) <= {
        "train", "validation", "test"
    }


def test_batch_iterator_resumes(spark):
    df = spark.createDataFrame(
        [(f"r{i}", f"s{i % 3}") for i in range(40)], "id string, source string"
    )
    ck = Checkpoint(seed=42, epoch=0, step=0)
    batches = list(batch_iterator(df, "id", "source", ck, batch_size=8))
    full = [r for _, b in batches for r in b["id"].tolist()]
    assert len(full) == 42  # oversampled interleave: 3 sources × max_len 14

    ck2 = Checkpoint(seed=42, epoch=0, step=2)
    resumed = list(batch_iterator(df, "id", "source", ck2, batch_size=8))
    resumed_ids = [r for _, b in resumed for r in b["id"].tolist()]
    assert resumed_ids == full[16:]  # resume == skip first two batches

    d = tempfile.mkdtemp(prefix="ck_")
    try:
        p = os.path.join(d, "ck.json")
        Checkpoint(seed=42, epoch=1, step=3).save(p)
        loaded = Checkpoint.load(p, expect_seed=42)
        assert loaded.epoch == 1 and loaded.step == 3
        with pytest.raises(ValueError):
            Checkpoint.load(p, expect_seed=7)  # seed guard (splits.rs:563-611)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hf_manifest_shard_selection_is_deterministic():
    """Offline twin of the live manifest walk: config defaults to the
    first config, split to 'train', URLs sorted."""
    from rust_triplets_spark.sources.hf_source import (
        HfSourceConfig, select_manifest_shards,
    )

    manifest = {
        "parquet_files": [
            {"config": "plain", "split": "train", "url": "https://x/b.parquet"},
            {"config": "plain", "split": "train", "url": "https://x/a.parquet"},
            {"config": "plain", "split": "test", "url": "https://x/t.parquet"},
            {"config": "zother", "split": "train", "url": "https://x/z.parquet"},
        ]
    }
    cfg = HfSourceConfig(dataset="org/ds")
    assert select_manifest_shards(manifest, cfg) == [
        "https://x/a.parquet", "https://x/b.parquet",
    ]
    cfg2 = HfSourceConfig(dataset="org/ds", config="zother")
    assert select_manifest_shards(manifest, cfg2) == ["https://x/z.parquet"]
    assert select_manifest_shards({}, cfg) == []


def test_hf_snapshot_requires_live_opt_in(tmp_path, monkeypatch):
    """Without the env opt-in the live path must refuse — the engine never
    reaches the network implicitly."""
    import pytest

    from rust_triplets_spark.sources.hf_source import (
        HfSourceConfig, LIVE_HF_ENV, snapshot_hf_dataset,
    )

    monkeypatch.delenv(LIVE_HF_ENV, raising=False)
    with pytest.raises(RuntimeError, match="opt-in"):
        snapshot_hf_dataset(HfSourceConfig(dataset="org/ds"), str(tmp_path))


def test_hf_live_snapshot_integration(spark, tmp_path):
    """LIVE test — runs only with RUST_TRIPLETS_LIVE_HF=1 and network
    access (the reference gates its live suite with TRIPLETS_SKIP_LIVE_TESTS,
    tests/hf_live.rs); skipped-green offline."""
    import os

    import pytest

    from rust_triplets_spark.sources.hf_source import (
        LIVE_HF_ENV, parse_source_line, read_hf_records_live,
    )

    if not os.environ.get(LIVE_HF_ENV):
        pytest.skip(f"set {LIVE_HF_ENV}=1 to run the live HF snapshot test")
    cfg = parse_source_line("hf://hf-internal-testing/fixtures_ade20k text=file")
    out = read_hf_records_live(spark, cfg, str(tmp_path))
    assert out.count() >= 0 and "sections" in out.columns


def test_hf_live_read_reuses_existing_snapshot(spark, tmp_path):
    """cfg.path short-circuits the network entirely — the offline-friendly
    half of the live path."""
    from rust_triplets_spark.sources.hf_source import (
        HfSourceConfig, read_hf_records_live,
    )

    snap = str(tmp_path / "snap")
    spark.createDataFrame(
        [("q1", "a1"), ("q2", "a2"), ("", "a3")], "question string, answer string"
    ).write.parquet(snap)
    cfg = HfSourceConfig(
        dataset="org/ds", path=snap,
        anchor_candidates=("question",), positive_candidates=("answer",),
    )
    out = read_hf_records_live(spark, cfg, cache_dir=str(tmp_path / "unused"))
    assert out.count() == 2  # empty-anchor row dropped
    assert {r["source"] for r in out.select("source").collect()} == {"hf_org_ds"}


def test_file_source_default_lanes_run_through_selector_assembly(spark):
    """The file-source recipe lanes (file_source.rs:156-210) must execute
    end-to-end through selector assembly over a title/body corpus."""
    from rust_triplets_spark.operators.triplets import assemble_selector_triplets
    from rust_triplets_spark.sources.file_source import (
        default_title_context_triplet_recipes,
    )

    rows = []
    for i in range(40):
        rows.append((i, 0, "anchor", f"title of doc {i}", f"src{i % 2}"))
        rows.append((i, 1, "context", f"body text for document {i} words", f"src{i % 2}"))
    sections = spark.createDataFrame(
        rows, "record_id long, section_idx long, role string, text string, source string"
    )
    lanes = default_title_context_triplet_recipes(include_date_aware=False)
    assert abs(sum(r.weight for r in lanes) - 1.0) < 1e-9
    for lane in lanes:
        out = assemble_selector_triplets(sections, lane, seed=42)
        rows_out = out.collect()
        assert rows_out, lane.name
        for r in rows_out:
            assert r["recipe"] == lane.name
            assert r["negative_id"] != r["anchor_id"]
        # negative_selector=Role('anchor') lanes draw negatives from titles
        if lane.name == "title_anchor_wrong_article":
            assert all(r["negative_text"].startswith("title") for r in rows_out)
        if lane.name == "title_context_wrong_article":
            assert all(r["negative_text"].startswith("body") for r in rows_out)
