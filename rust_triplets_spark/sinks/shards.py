"""Training-shard export: deterministic global shuffle → N shards.

The last step of a training-data pipeline is writing the packed/filtered
corpus as N shard files in a pseudo-random order (data loaders stream
shards sequentially, so the shuffle must be IN the layout — reading in
row-group order must already be shuffled). The reference never exports
(its pull-API serves batches straight from memory, src/sampler/mod.rs);
this is the Spark-native equivalent of that contract at rest: the shard
and the in-shard position are pure functions of ``(id, seed)`` — the same
stable-id determinism as split assignment (src/splits.rs:623-637), so
re-running the export over a grown corpus keeps every old row's shard
stable and is resumable/verifiable row-by-row.

Scale shape: shard = ``hash31(id, seed) % n_shards`` (row-local);
in-shard position = rank of an independent order hash within the shard,
computed by :func:`~rust_triplets_spark.functions.ordering
.bucketed_position` — range-bucketed parallel rank, never a
single-partition sort. The write repartitions BY SHARD (one exchange) and
sorts within partitions, so each output file is one contiguous,
internally-shuffled shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    hash31_col,
    hash31_sql,
    hash31_str_col,
)

SHARD_SEED_OFF = 701  # shard membership
ORDER_SEED_OFF = 702  # intra-shard shuffle order


def shard_assignment(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    id_is_string: bool = False,
) -> DataFrame:
    """(id, shard, pos): deterministic shard + in-shard shuffle position.

    ``shard`` is uniform over [0, n_shards); ``pos`` is the 0-based rank
    of ``hash31(id, seed + ORDER_SEED_OFF)`` within the shard (ties broken
    by id) — an order uncorrelated with shard membership, ingest order, or
    any corpus attribute, which is exactly what "globally shuffled" means
    here. Both are pure (id, seed) functions; the DuckDB twin
    (:func:`shard_assignment_sql`) hash-matches exactly."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from rust_triplets_spark.functions.ordering import bucketed_position

    h = hash31_str_col(id_col, seed + SHARD_SEED_OFF) if id_is_string else hash31_col(
        F.col(id_col), seed + SHARD_SEED_OFF
    )
    oh = hash31_str_col(id_col, seed + ORDER_SEED_OFF) if id_is_string else hash31_col(
        F.col(id_col), seed + ORDER_SEED_OFF
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.pmod(h, F.lit(n_shards)).cast("long").alias("shard"),
        oh.alias("__oh"),
    )
    ranked = bucketed_position(
        base, "__oh", tiebreak=["id"], part_cols=["shard"], out_col="pos"
    )
    return ranked.select("id", "shard", F.col("pos").cast("long").alias("pos"))


def shard_assignment_sql(
    table: str,
    id_sql: str,
    n_shards: int,
    seed: int = 42,
    id_is_string: bool = False,
) -> str:
    """DuckDB twin of :func:`shard_assignment` (plain window form — the
    oracle does not need the bucketed-rank decomposition)."""
    from rust_triplets_spark.functions.hashing import strfold_sql

    idf = strfold_sql("id") if id_is_string else "CAST(id AS BIGINT)"
    h = hash31_sql(idf, seed + SHARD_SEED_OFF)
    oh = hash31_sql(idf, seed + ORDER_SEED_OFF)
    return f"""
SELECT id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY oh, id) - 1 AS BIGINT) AS pos
FROM (
  SELECT id, CAST(((({h}) % {n_shards}) + {n_shards}) % {n_shards} AS BIGINT) AS shard,
         {oh} AS oh
  FROM (SELECT {id_sql} AS id FROM {table})
)
"""


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    id_is_string: bool = False,
    mode: str = "overwrite",
) -> None:
    """Export ``df`` as ``shard=K`` parquet directories, each internally
    ordered by the deterministic shuffle position. One exchange
    (repartition by shard), one in-partition sort; readers stream a shard
    in row-group order and observe the shuffled order directly.

    ``id_col`` must be unique (the stable-ID contract every split/epoch
    operator already relies on) — duplicate ids would fan out through the
    assignment join."""
    asn = shard_assignment(df, id_col, n_shards, seed, id_is_string)
    payload = df.join(asn.withColumnRenamed("id", id_col), id_col)
    (
        payload.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    id_is_string: bool = False,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """:func:`write_training_shards` in JSONL — the lingua franca LLM
    training loaders actually consume. Identical deterministic layout
    (``shard=K`` directories, rows inside each file in shuffle-``pos``
    order, one line per record); ``compression='gzip'`` for the common
    shipping format. ``pos`` and ``shard_id`` are written INTO each record
    (``partitionBy`` strips the ``shard`` partition column from data
    files, so it is duplicated under another name): a loader that
    concatenates or re-splits files can still verify and re-derive the
    order — the at-rest contract stays row-by-row checkable."""
    asn = shard_assignment(df, id_col, n_shards, seed, id_is_string)
    payload = df.join(asn.withColumnRenamed("id", id_col), id_col).withColumn(
        "shard_id", F.col("shard")
    )
    w = (
        payload.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
    )
    if compression:
        w = w.option("compression", compression)
    w.partitionBy("shard").json(path)


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    members: dict[str, str],
    n_shards: int,
    seed: int = 42,
    id_is_string: bool = False,
) -> None:
    """:func:`write_training_shards` in WebDataset form — one
    ``shard-{K:05d}.tar`` per shard, each sample a group of adjacently
    stored tar members ``{key}.{ext}`` (the format multimodal loaders
    stream: tars read sequentially, no random access, storage-friendly).

    ``members`` maps column → member extension (e.g. ``{"text": "txt",
    "image": "jpg", "meta": "json"}``); string columns are UTF-8 encoded,
    binary columns written verbatim — the engine's multimodal contract
    (blobs are opaque bytes with typed metadata,
    :mod:`...operators.multimodal`). The sample key is
    ``{pos:09d}.{id}`` so members sort in shuffle order inside the tar
    and a loader can verify both position and identity without a side
    index.

    Scale shape: the same one-exchange layout as the parquet/JSONL
    writers — repartition by shard, in-partition sort by (shard, pos),
    then ONE pass per partition writing each shard's tar as its rows
    stream by (a partition may carry several shards under hash
    partitioning; the sort makes each contiguous, so at most one tar is
    open at a time and nothing buffers beyond the tar library's current
    member). Tar metadata (mtime/uid/mode) is zeroed so shard bytes are
    REPRODUCIBLE: same corpus + seed → byte-identical tars, the property
    every resume/audit story here builds on. ``path`` must be visible to
    every executor (shared/distributed filesystem or a fuse-mounted
    object store) — on a real cluster each task writes its shards
    directly; local[N] sees one filesystem anyway."""
    import os
    import tarfile

    if not members:
        raise ValueError("members must map at least one column to an extension")
    missing = [c for c in members if c not in df.columns]
    if missing:
        raise ValueError(f"member columns not in frame: {missing}")

    os.makedirs(path, exist_ok=True)
    asn = shard_assignment(df, id_col, n_shards, seed, id_is_string)
    cols = [F.col(id_col).cast("string").alias("__id"), "shard", "pos",
            *[F.col(c).alias(f"__m_{c}") for c in members]]
    payload = (
        df.join(asn.withColumnRenamed("id", id_col), id_col)
        .select(*cols)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )
    member_items = sorted(members.items())  # deterministic member order

    def _write(rows):
        # Task attempts are not exclusive: a retry or speculative duplicate
        # of this partition can run CONCURRENTLY with the original, and two
        # attempts opening the same shard-NNNNN.tar with mode 'w' interleave
        # or truncate each other. So each attempt writes to an
        # attempt-unique temp name and commits with os.replace (atomic on
        # POSIX) only on success — last completed attempt wins with a whole,
        # byte-identical tar; a failed attempt removes its temp and never
        # touches the final name.
        import io

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        tar = None
        open_shard = None
        tmp_name = final_name = None

        def _commit():
            nonlocal tar, tmp_name
            if tar is not None:
                tar.close()
                tar = None
                os.replace(tmp_name, final_name)
                tmp_name = None  # committed — nothing to clean up

        try:
            for r in rows:
                if r["shard"] != open_shard:
                    _commit()
                    open_shard = r["shard"]
                    final_name = os.path.join(
                        path, f"shard-{open_shard:05d}.tar"
                    )
                    tmp_name = f"{final_name}.tmp-{attempt}"
                    tar = tarfile.open(tmp_name, "w")
                key = f"{r['pos']:09d}.{r['__id']}"
                for col, ext in member_items:
                    raw = r[f"__m_{col}"]
                    if raw is None:
                        continue
                    data = raw if isinstance(raw, (bytes, bytearray)) else str(raw).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # reproducible bytes
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(bytes(data)))
            _commit()
        finally:
            # exception path: drop the partial temp. tmp_name is still set
            # whenever a temp exists and was not committed — including the
            # case where os.replace itself raised after tar was closed.
            if tar is not None:
                tar.close()
            if tmp_name is not None:
                try:
                    os.remove(tmp_name)
                except OSError:
                    pass
        return iter(())

    payload.rdd.mapPartitions(_write).count()  # one pass, side-effect write
