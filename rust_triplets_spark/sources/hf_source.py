"""HuggingFace-style dataset ingestion (SURVEY §2.1 ``HuggingFaceRowSource``,
reference ``src/source/backends/huggingface_source.rs``).

The reference streams datasets-server parquet shards with local caching
(~9k LoC of download machinery). Spark already reads remote/local parquet
natively, so this module keeps exactly the *semantics* that matter:

- **source-list line parser** (huggingface_source.rs:242-345):
  ``hf://org/dataset[/config][/split] key=value …`` → config;
- **column-mapping modes** (huggingface_source.rs:536-637): role mode with
  *candidate lists* (first non-empty of ``anchor=a|b|c`` wins), strictly
  required ``context=`` columns (missing/blank ⇒ row dropped), text mode;
- **ClassLabel resolution** (huggingface_source.rs:616-629): integer
  columns resolved through a label map before use;
- slug derivation for the source id (huggingface_source.rs:381-415).

Reading the actual ``hf://`` scheme needs network credentials; point
``path`` at any parquet snapshot (local mirror or mounted dataset).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_triplets_spark.functions.text import normalize_inline_whitespace_col
from rust_triplets_spark.schema import DEFAULT_TRUST, make_section


@dataclass
class HfSourceConfig:
    dataset: str  # org/name
    config: str | None = None
    split: str | None = None
    path: str | None = None  # parquet snapshot location
    id_column: str | None = None
    anchor_candidates: tuple[str, ...] = ()
    positive_candidates: tuple[str, ...] = ()
    context_columns: tuple[str, ...] = ()  # strictly required
    text_column: str | None = None
    trust: float = DEFAULT_TRUST
    label_maps: dict = field(default_factory=dict)  # column -> [labels]

    @property
    def source_id(self) -> str:
        """Slug derivation (huggingface_source.rs:381-415)."""
        parts = [self.dataset.replace("/", "_")]
        if self.config:
            parts.append(self.config)
        if self.split:
            parts.append(self.split)
        return "hf_" + "_".join(parts).replace("-", "_").lower()


def parse_source_line(line: str) -> HfSourceConfig:
    """``hf://org/ds[/config][/split] anchor=q|question positive=answer
    context=ctx id=doc_id text=body`` (huggingface_source.rs:242-345)."""
    line = line.strip()
    if not line.startswith("hf://"):
        raise ValueError(f"not an hf:// source line: {line!r}")
    head, *kvs = line.split()
    segs = head[len("hf://"):].split("/")
    if len(segs) < 2:
        raise ValueError(f"need org/dataset in {head!r}")
    dataset = "/".join(segs[:2])
    config = segs[2] if len(segs) > 2 else None
    split = segs[3] if len(segs) > 3 else None
    cfg = HfSourceConfig(dataset=dataset, config=config, split=split)
    for kv in kvs:
        if "=" not in kv:
            raise ValueError(f"malformed key=value: {kv!r}")
        k, v = kv.split("=", 1)
        if k == "anchor":
            cfg.anchor_candidates = tuple(v.split("|"))
        elif k == "positive":
            cfg.positive_candidates = tuple(v.split("|"))
        elif k == "context":
            cfg.context_columns = tuple(v.split("|"))
        elif k == "text":
            cfg.text_column = v
        elif k == "id":
            cfg.id_column = v
        elif k == "trust":
            cfg.trust = float(v)
        elif k == "path":
            cfg.path = v
        else:
            raise ValueError(f"unknown source option {k!r}")
    return cfg


def _resolve_label(cfg: HfSourceConfig, col: str) -> F.Column:
    """ClassLabel int → string through the label map when configured."""
    if col in cfg.label_maps:
        labels = cfg.label_maps[col]
        arr = F.array(*[F.lit(x) for x in labels])
        return F.element_at(arr, F.col(col).cast("int") + 1).cast("string")
    return F.col(col).cast("string")


def _first_non_empty(cfg: HfSourceConfig, candidates: tuple[str, ...], df: DataFrame) -> F.Column:
    cols = [
        normalize_inline_whitespace_col(_resolve_label(cfg, c))
        for c in candidates
        if c in df.columns
    ]
    if not cols:
        return F.lit(None).cast("string")
    out = F.lit(None).cast("string")
    for c in reversed(cols):
        out = F.when(c.isNotNull() & (F.length(c) > 0), c).otherwise(out)
    return out


def read_hf_records(spark: SparkSession, cfg: HfSourceConfig) -> DataFrame:
    if not cfg.path:
        raise ValueError("set cfg.path to a parquet snapshot of the dataset")
    raw = spark.read.parquet(cfg.path)

    rid = (
        F.col(cfg.id_column).cast("string")
        if cfg.id_column and cfg.id_column in raw.columns
        else F.monotonically_increasing_id().cast("string")
    )

    sections = []
    keep = F.lit(True)
    if cfg.text_column:
        text = normalize_inline_whitespace_col(_resolve_label(cfg, cfg.text_column))
        sections = [make_section("anchor", text), make_section("context", text)]
        keep = keep & (F.length(text) > 0)
    else:
        anchor = _first_non_empty(cfg, cfg.anchor_candidates, raw)
        sections = [make_section("anchor", anchor)]
        keep = keep & anchor.isNotNull() & (F.length(anchor) > 0)
        if cfg.positive_candidates:
            positive = _first_non_empty(cfg, cfg.positive_candidates, raw)
            sections.append(make_section("context", positive))
            keep = keep & positive.isNotNull() & (F.length(positive) > 0)
        for ctx in cfg.context_columns:  # strictly required
            if ctx not in raw.columns:
                raise ValueError(f"required context column {ctx!r} missing")
            c = normalize_inline_whitespace_col(_resolve_label(cfg, ctx))
            sections.append(make_section("context", c))
            keep = keep & c.isNotNull() & (F.length(c) > 0)

    return raw.where(keep).select(
        F.concat(F.lit(cfg.source_id + "::"), rid).alias("id"),
        F.lit(cfg.source_id).alias("source"),
        F.lit(None).cast("timestamp").alias("created_at"),
        F.lit(None).cast("timestamp").alias("updated_at"),
        F.lit(float(cfg.trust)).cast("float").alias("trust"),
        F.array(F.lit(cfg.source_id)).alias("taxonomy"),
        F.array(*sections).alias("sections"),
    )


# ---------------------------------------------------------------------------
# live snapshot path (the reference's manifest-fetch + shard-download core,
# huggingface_source.rs:905+, reduced to public HTTP APIs + stdlib): the
# datasets-server parquet manifest lists ready-made parquet shards per
# (config, split); we download them once into a local snapshot dir and let
# Spark's parquet reader take over. Gated: callers opt in via the
# RUST_TRIPLETS_LIVE_HF env var (the reference gates its live tests with
# TRIPLETS_SKIP_LIVE_TESTS, tests/hf_live.rs) — everything below degrades
# to a clear error offline, never a hang.
# ---------------------------------------------------------------------------

HF_MANIFEST_URL = "https://datasets-server.huggingface.co/parquet?dataset={dataset}"
LIVE_HF_ENV = "RUST_TRIPLETS_LIVE_HF"
# orphaned-.tmp sweep age gate: a tmp YOUNGER than this may belong to a
# concurrent same-manifest download still in flight (deterministic tmp
# names) — only provably stale leftovers from crashed runs are removed
TMP_SWEEP_AGE_S = 3600.0


def select_manifest_shards(manifest: dict, cfg: HfSourceConfig) -> list[str]:
    """Pick the shard URLs matching ``cfg`` from a datasets-server parquet
    manifest (the JSON shape of ``/parquet?dataset=…``: a ``parquet_files``
    list of ``{config, split, url, …}``). Config/split default to the
    manifest's first config and to ``train`` (huggingface_source.rs default
    split handling). Deterministic: URLs sorted."""
    files = manifest.get("parquet_files") or []
    if not files:
        return []
    config = cfg.config or sorted({f["config"] for f in files})[0]
    split = cfg.split or "train"
    return sorted(
        f["url"] for f in files if f["config"] == config and f["split"] == split
    )


def build_hf_request(url: str) -> "object":
    """The exact HTTP request the live path sends: plain GET, with an
    ``Authorization: Bearer $HF_TOKEN`` header iff the env var is set
    (gated-dataset auth, huggingface_source.rs token handling). Split out
    of the download loop so the URL/auth contract is golden-string
    testable without network (tests/test_hf_offline_snapshot.py)."""
    import os
    import urllib.request

    req = urllib.request.Request(url)
    token = os.environ.get("HF_TOKEN")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    return req


def shard_cache_name(index: int, url: str) -> str:
    """Cache filename for shard ``index`` downloaded from ``url``: the
    position prefix keeps directory listings ordered; the URL content hash
    makes the cache key — an upstream re-shard/re-order can never let an
    old file pass as the new shard at the same position."""
    from rust_triplets_spark.functions.hashing import hash31_str_py

    return f"shard-{index:05d}-{hash31_str_py(url):08x}.parquet"


def snapshot_hf_dataset(cfg: HfSourceConfig, cache_dir: str, timeout: float = 60.0) -> str:
    """Download the dataset's parquet shards into
    ``{cache_dir}/{source_id}/`` (skipping shards already present — the
    reference's lazy shard cache) and return that directory. Uses only
    stdlib HTTP; ``HF_TOKEN`` is honored for gated datasets. Requires the
    ``RUST_TRIPLETS_LIVE_HF`` opt-in so nothing in the engine reaches the
    network implicitly."""
    import json
    import os
    import urllib.request

    if not os.environ.get(LIVE_HF_ENV):
        raise RuntimeError(
            f"live HF snapshotting is opt-in: set {LIVE_HF_ENV}=1 "
            "(or point cfg.path at an existing parquet snapshot)"
        )

    def _open(url: str):
        return urllib.request.urlopen(build_hf_request(url), timeout=timeout)

    with _open(HF_MANIFEST_URL.format(dataset=cfg.dataset)) as resp:
        manifest = json.load(resp)
    urls = select_manifest_shards(manifest, cfg)
    if not urls:
        raise ValueError(
            f"no parquet shards for {cfg.dataset} config={cfg.config} split={cfg.split}"
        )
    dest_dir = os.path.join(cache_dir, cfg.source_id)
    os.makedirs(dest_dir, exist_ok=True)
    # cache key = URL content hash, not just the positional index (see
    # shard_cache_name): an upstream re-shard/re-order must not let an old
    # shard file pass as the new shard at the same position.
    expected = {shard_cache_name(i, url) for i, url in enumerate(urls)}
    for i, url in enumerate(urls):
        dest = os.path.join(dest_dir, shard_cache_name(i, url))
        if os.path.exists(dest) and os.path.getsize(dest) > 0:
            continue  # lazy shard cache hit (same position AND same URL)
        tmp = dest + ".tmp"
        with _open(url) as resp, open(tmp, "wb") as out:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
        os.replace(tmp, dest)  # publish complete shards only
    # Prune shards not in the CURRENT manifest only AFTER every download
    # for this manifest has succeeded: pruning first would delete a still-
    # valid cache and a mid-download failure would leave neither version
    # readable. Post-success pruning keeps the directory read from mixing
    # two dataset versions while never destroying the only good copy.
    # (Concurrent snapshots of *different* manifests into one source_id
    # dir remain unsupported — callers key cache_dir/source_id per
    # dataset revision.)
    # Also sweep orphaned .tmp files: a crashed download before os.replace
    # leaves a partial *.parquet.tmp that no later run would ever reuse
    # (fresh downloads re-create their own tmp and replace over it). Only
    # tmp files older than TMP_SWEEP_AGE_S are removed: a CONCURRENT run of
    # the same manifest may have an in-flight tmp right now, and deleting
    # it would turn its os.replace into FileNotFoundError (same-manifest
    # concurrency is already racy — deterministic tmp names — but the
    # age gate keeps the sweep from widening that window into a hard
    # crash). Races on the remove itself are tolerated: the other
    # contender may have published/removed first.
    import time as _time

    now = _time.time()
    for name in os.listdir(dest_dir):
        path = os.path.join(dest_dir, name)
        try:
            if name.endswith(".tmp"):
                if now - os.path.getmtime(path) > TMP_SWEEP_AGE_S:
                    os.remove(path)
            elif name.endswith(".parquet") and name not in expected:
                os.remove(path)
        except FileNotFoundError:
            pass
    return dest_dir


def read_hf_records_live(
    spark: SparkSession, cfg: HfSourceConfig, cache_dir: str
) -> DataFrame:
    """End-to-end live path: snapshot (or reuse) the parquet shards, then
    apply the standard column-mapping read (:func:`read_hf_records`)."""
    from dataclasses import replace

    path = cfg.path or snapshot_hf_dataset(cfg, cache_dir)
    return read_hf_records(spark, replace(cfg, path=path))
