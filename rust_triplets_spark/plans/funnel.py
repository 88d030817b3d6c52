"""End-to-end training-set materialization: the WHOLE pipeline as one plan.

The reference's user story is "configure sources + recipes, pull training
batches" (``/root/reference/src/sampler/mod.rs`` — ingest, split, sample in
one engine). The Spark engine's equivalent at-rest contract is this module:
raw corpus → near-dup dedup (keep frame) → leakage-free split → token
packing → deterministic shard layout, composed as ONE DataFrame plan whose
every stage is an already-oracle-checked operator. The composition itself
is what this proves: survivors of the dedup gate feed the packer, the
packer's token offsets feed the context-window audit, and the shard/pos
layout is a pure function of the surviving ids — so the final manifest is
exactly reproducible from (corpus, seed) alone, which is the reference's
stable-ID determinism contract (``src/splits.rs:623-637``) extended to the
whole pipeline.

Scale shape (nothing new — inherited stage by stage):
- clustering: MinHash-LSH bucketed pairs + O(log n) pointer-jumping
  (``operators/dedup.neardup_clusters``), the only iterative stage;
- keep + split gates: row-local column arithmetic on the cluster frame
  (``id = rep`` and a hash cut on ``rep``) — no extra shuffle;
- packing: range-bucketed parallel rank + prefix sum per source
  (``operators/packing.pack_sequences``) — never a single-partition sort;
- shards: hash membership + bucketed in-shard rank (``sinks/shards``).
One corpus scan feeds the cluster stage; the survivor frame is scope-cached
because both the packer and the shard ranker consume it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.caching import cache_scoped
from rust_triplets_spark.operators.dedup import (
    MINHASH_SEED,
    minhash_lsh_pairs,
    neardup_clusters,
    neardup_clusters_sql,
)
from rust_triplets_spark.operators.packing import pack_sequences, pack_sequences_sql
from rust_triplets_spark.operators.splits import (
    DEFAULT_RATIOS,
    split_label_col,
    split_label_sql,
)
from rust_triplets_spark.sinks.shards import shard_assignment, shard_assignment_sql


def training_manifest(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    *,
    budget: int = 512,
    n_shards: int = 4,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    minhash_seed: int = MINHASH_SEED,
) -> DataFrame:
    """One row per TRAIN-split dedup survivor with its pack + shard slot.

    Columns: ``(id, source, n_tok, seq_idx, start_tok, bin_id, crosses,
    shard, pos)`` — everything a data loader needs to stream the corpus:
    which context window the document starts in (``bin_id``), whether the
    trainer must split it across windows (``crosses``), and its position
    in the globally shuffled shard layout (``shard``, ``pos``).

    Gate semantics: a document survives iff it is its near-dup cluster's
    min-id representative AND the cluster's split label (derived from the
    REP id, so near-copies can never straddle the cut —
    ``operators/splits.cluster_aware_splits``) is ``train``. Since the
    survivor IS the rep, the label check is a pure function of the
    survivor's own id; empty documents (0 tokens) drop at the packer, and
    shard positions are ranked over packed survivors only, so the manifest
    has no gaps."""
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        seed=minhash_seed,
    )
    clusters = neardup_clusters(docs, id_col, text_col, pairs=pairs)
    gate = clusters.where(
        (F.col("id") == F.col("rep"))
        & (split_label_col(F.col("rep"), seed, ratios) == F.lit("train"))
    ).select("id")
    surv = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("__text"),
        F.col(source_col).alias("__source"),
    ).join(gate, "id")
    packed = cache_scoped(
        pack_sequences(surv, "id", "__text", "__source", budget),
        "funnel.training_packed",
    )
    sh = shard_assignment(packed.select("id"), "id", n_shards, seed)
    return packed.join(sh, "id").select(
        "id", "source", "n_tok", "seq_idx", "start_tok", "bin_id", "crosses",
        "shard", "pos",
    )


def training_manifest_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    source_sql: str,
    *,
    budget: int = 512,
    n_shards: int = 4,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    minhash_seed: int = MINHASH_SEED,
) -> str:
    """DuckDB twin of :func:`training_manifest`: the same four stages as
    chained CTEs — recursive-closure clusters, rep+split gate, window-form
    packing, window-form shard ranks."""
    clusters = neardup_clusters_sql(
        table, id_sql, text_sql, num_hashes, bands, shingle_n, minhash_seed
    )
    label = split_label_sql("c.rep", seed, ratios)
    packed = pack_sequences_sql("tf_surv", "id", "text", "source", budget)
    sh = shard_assignment_sql("(SELECT id FROM tf_packed)", "id", n_shards, seed)
    return f"""
WITH tf_clusters AS MATERIALIZED ({clusters}),
tf_surv AS MATERIALIZED (
  SELECT CAST({id_sql} AS BIGINT) AS id, {text_sql} AS text,
         {source_sql} AS source
  FROM {table} JOIN tf_clusters c ON CAST({id_sql} AS BIGINT) = c.id
  WHERE c.id = c.rep AND ({label}) = 'train'
),
tf_packed AS MATERIALIZED ({packed}),
tf_sh AS ({sh})
SELECT p.id, p.source, p.n_tok, p.seq_idx, p.start_tok, p.bin_id, p.crosses,
       s.shard, s.pos
FROM tf_packed p JOIN tf_sh s ON p.id = s.id
"""
