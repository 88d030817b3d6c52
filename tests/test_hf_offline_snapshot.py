"""Offline end-to-end test of the HF manifest→shard→mapping path.

The live path (sources/hf_source.py: snapshot_hf_dataset →
read_hf_records_live) was previously exercised only by the env-gated
network test. This drives the SAME code offline via ``file://`` URLs over
the committed fixture under ``fixtures/hf/`` (a datasets-server-style
manifest JSON + three 2-3-row parquet shards), covering manifest fetch,
config/split shard selection, the download loop with its lazy cache and
post-success stale-shard pruning, and the role-mode column mapping with
candidate lists + ClassLabel resolution (reference semantics:
huggingface_source.rs:536-637, 905+)."""

import json
import os

import pytest

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "hf"
)


@pytest.fixture()
def offline_manifest(tmp_path, monkeypatch):
    """Render the committed manifest template with file:// URLs and point
    HF_MANIFEST_URL at it, so the full live path runs without network."""
    from rust_triplets_spark.sources import hf_source

    base = "file://" + FIXTURE_DIR
    manifest = json.load(open(os.path.join(FIXTURE_DIR, "manifest.json")))
    for f in manifest["parquet_files"]:
        f["url"] = f["url"].format(base=base)
    mpath = tmp_path / "manifest.json"
    mpath.write_text(json.dumps(manifest))
    # no query string: file:// URLs reject them; .format(dataset=…) on a
    # placeholder-free template is a no-op, which is fine here
    monkeypatch.setattr(hf_source, "HF_MANIFEST_URL", "file://" + str(mpath))
    monkeypatch.setenv(hf_source.LIVE_HF_ENV, "1")
    return manifest


def _cfg():
    from rust_triplets_spark.sources.hf_source import parse_source_line

    cfg = parse_source_line(
        "hf://demo/qa anchor=question|query_alt positive=answer id=qid trust=0.9"
    )
    cfg.label_maps = {"topic": ["engine", "planner"]}
    return cfg


def test_manifest_selects_config_and_split_shards(offline_manifest):
    from rust_triplets_spark.sources.hf_source import select_manifest_shards

    urls = select_manifest_shards(offline_manifest, _cfg())
    names = [u.rsplit("/", 1)[-1] for u in urls]
    # default config + train split only; sorted; eval + other-config excluded
    assert names == ["shard-000.parquet", "shard-001.parquet"]


def test_snapshot_downloads_caches_and_prunes(offline_manifest, tmp_path):
    from rust_triplets_spark.sources.hf_source import snapshot_hf_dataset

    cache = str(tmp_path / "cache")
    cfg = _cfg()
    dest = snapshot_hf_dataset(cfg, cache)
    files = sorted(f for f in os.listdir(dest) if f.endswith(".parquet"))
    assert len(files) == 2 and all(f.startswith("shard-0000") for f in files)

    # stale shard (not in the current manifest) is pruned AFTER a
    # successful snapshot; cached shards survive (same mtimes = no re-download)
    stale = os.path.join(dest, "shard-99999-deadbeef.parquet")
    open(stale, "wb").write(b"x")
    mtimes = {f: os.path.getmtime(os.path.join(dest, f)) for f in files}
    dest2 = snapshot_hf_dataset(cfg, cache)
    assert dest2 == dest
    assert not os.path.exists(stale)
    assert {f: os.path.getmtime(os.path.join(dest, f)) for f in files} == mtimes


def test_offline_snapshot_read_maps_columns_and_classlabels(
    offline_manifest, tmp_path, spark
):
    from rust_triplets_spark.sources.hf_source import read_hf_records_live

    rows = read_hf_records_live(spark, _cfg(), str(tmp_path / "cache")).collect()
    by_id = {r["id"]: r for r in rows}
    # 5 train rows; qid 21 dropped (blank answer); eval shard never read
    assert sorted(by_id) == [
        "hf_demo_qa::10", "hf_demo_qa::11", "hf_demo_qa::12", "hf_demo_qa::20",
    ]
    # candidate list: blank `question` falls through to `query_alt`
    anchors = {r["id"]: r["sections"][0]["text"] for r in rows}
    assert anchors["hf_demo_qa::11"] == "Why shuffle?"
    assert anchors["hf_demo_qa::10"] == "What is Spark?"
    positives = {r["id"]: r["sections"][1]["text"] for r in rows}
    assert positives["hf_demo_qa::12"] == "broadcast hash join"
    assert all(r["source"] == "hf_demo_qa" for r in rows)
    assert all(abs(r["trust"] - 0.9) < 1e-6 for r in rows)


def test_classlabel_resolution_through_label_map(offline_manifest, tmp_path, spark):
    """An int ClassLabel column used as a MAPPED field resolves through the
    label list (huggingface_source.rs:616-629)."""
    from rust_triplets_spark.sources.hf_source import (
        parse_source_line, read_hf_records_live,
    )

    cfg = parse_source_line("hf://demo/qa anchor=question|query_alt positive=topic id=qid")
    cfg.label_maps = {"topic": ["engine", "planner"]}
    rows = read_hf_records_live(spark, cfg, str(tmp_path / "cache")).collect()
    positives = {r["id"]: r["sections"][1]["text"] for r in rows}
    assert positives["hf_demo_qa::10"] == "engine"   # topic=0
    assert positives["hf_demo_qa::20"] == "planner"  # topic=1


def test_tmp_sweep_is_age_gated(offline_manifest, tmp_path):
    """ADVICE r6: the orphaned-.tmp sweep must not delete a FRESH tmp (a
    concurrent same-manifest run's in-flight download) — only tmps older
    than TMP_SWEEP_AGE_S are garbage from crashed runs."""
    from rust_triplets_spark.sources import hf_source as hf

    cache = str(tmp_path / "cache")
    dest = hf.snapshot_hf_dataset(_cfg(), cache)

    fresh = os.path.join(dest, "shard-00001-cafecafe.parquet.tmp")
    stale = os.path.join(dest, "shard-00000-deadbeef.parquet.tmp")
    open(fresh, "wb").write(b"inflight")
    open(stale, "wb").write(b"crashed")
    old = os.path.getmtime(stale) - hf.TMP_SWEEP_AGE_S - 10
    os.utime(stale, (old, old))

    hf.snapshot_hf_dataset(_cfg(), cache)
    assert os.path.exists(fresh), "fresh in-flight tmp must survive the sweep"
    assert not os.path.exists(stale), "stale crashed tmp must be removed"
    os.remove(fresh)


def test_hf_url_and_auth_golden_strings(monkeypatch):
    """Golden-string pin of the live-path HTTP contract (the one surface
    the sandbox can never execute): exact manifest URL, exact auth header
    shape, exact shard cache filenames. Drift in any of these breaks the
    live path silently offline — these literals are the tripwire."""
    from rust_triplets_spark.sources import hf_source

    # manifest URL: datasets-server /parquet endpoint, dataset verbatim
    # (org/name keeps its slash — the datasets-server API accepts it raw)
    assert hf_source.HF_MANIFEST_URL == (
        "https://datasets-server.huggingface.co/parquet?dataset={dataset}"
    )
    assert hf_source.HF_MANIFEST_URL.format(dataset="squad") == (
        "https://datasets-server.huggingface.co/parquet?dataset=squad"
    )
    assert hf_source.HF_MANIFEST_URL.format(dataset="rajpurkar/squad") == (
        "https://datasets-server.huggingface.co/parquet?dataset=rajpurkar/squad"
    )

    # auth header: Bearer $HF_TOKEN iff set, nothing otherwise
    monkeypatch.delenv("HF_TOKEN", raising=False)
    req = hf_source.build_hf_request("https://example.com/x.parquet")
    assert req.get_full_url() == "https://example.com/x.parquet"
    assert req.get_header("Authorization") is None
    monkeypatch.setenv("HF_TOKEN", "hf_testtoken123")
    req = hf_source.build_hf_request("https://example.com/x.parquet")
    assert req.get_header("Authorization") == "Bearer hf_testtoken123"

    # shard cache names: position prefix + 31-bit URL hash, recorded
    # literals (a hash-fn or format change invalidates every user cache —
    # make that loud)
    u1 = "https://huggingface.co/api/datasets/squad/parquet/plain_text/train/0.parquet"
    u2 = "https://huggingface.co/api/datasets/org/name/parquet/default/validation/3.parquet"
    assert hf_source.shard_cache_name(0, u1) == "shard-00000-3ed8ab71.parquet"
    assert hf_source.shard_cache_name(12, u2) == "shard-00012-534041a1.parquet"


def test_manifest_shard_selection_variants():
    """select_manifest_shards against a recorded datasets-server manifest
    shape: config defaulting (first config, sorted), split defaulting
    (train), explicit config/split, and deterministic URL ordering."""
    from rust_triplets_spark.sources.hf_source import (
        HfSourceConfig,
        select_manifest_shards,
    )

    manifest = {
        "parquet_files": [
            {"config": "plain_text", "split": "train",
             "url": "https://h/api/d/parquet/plain_text/train/1.parquet"},
            {"config": "plain_text", "split": "train",
             "url": "https://h/api/d/parquet/plain_text/train/0.parquet"},
            {"config": "plain_text", "split": "validation",
             "url": "https://h/api/d/parquet/plain_text/validation/0.parquet"},
            {"config": "alt", "split": "train",
             "url": "https://h/api/d/parquet/alt/train/0.parquet"},
        ]
    }
    base = dict(dataset="d")
    # defaults: first config by sort order ('alt' < 'plain_text'), train
    assert select_manifest_shards(manifest, HfSourceConfig(**base)) == [
        "https://h/api/d/parquet/alt/train/0.parquet"
    ]
    # explicit config, default split, URLs sorted
    assert select_manifest_shards(
        manifest, HfSourceConfig(config="plain_text", **base)
    ) == [
        "https://h/api/d/parquet/plain_text/train/0.parquet",
        "https://h/api/d/parquet/plain_text/train/1.parquet",
    ]
    # explicit config + split
    assert select_manifest_shards(
        manifest, HfSourceConfig(config="plain_text", split="validation", **base)
    ) == ["https://h/api/d/parquet/plain_text/validation/0.parquet"]
    # no matching split -> empty; empty manifest -> empty
    assert select_manifest_shards(
        manifest, HfSourceConfig(config="alt", split="test", **base)
    ) == []
    assert select_manifest_shards({"parquet_files": []}, HfSourceConfig(**base)) == []
