"""Deterministic train/validation/test split assignment (SURVEY §2.5).

Mirrors ``derive_label_for_id`` (reference ``src/splits.rs:623-637``): the
label is a PURE function of ``(id, seed, ratios)`` — ``u = hash(id, seed)``
normalized to [0,1), compared against cumulative ratio cuts. This is the
reference's single most load-bearing invariant (stable ids ⇒ stable splits
as the corpus grows), and is why Spark's ``randomSplit`` is NOT used here
(it is partition-dependent, not id-stable).

Explicit overrides (``DeterministicSplitStore`` in-memory overrides,
``src/splits.rs:168-220``) become a broadcast left-join against a small
assignments DataFrame.

Scale: pure column arithmetic — no shuffle, no state, embarrassingly
parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    M31,
    hash31_col,
    hash31_str_col,
    hash31_str_sql,
    hash31_sql,
)

DEFAULT_RATIOS = (0.8, 0.1, 0.1)  # src/splits.rs:46-76
LABELS = ("train", "validation", "test")  # src/splits.rs:35-42


def validate_ratios(ratios: tuple[float, float, float]) -> None:
    if abs(sum(ratios) - 1.0) > 1e-6 or any(r < 0 for r in ratios):
        raise ValueError(f"split ratios must be >= 0 and sum to 1.0, got {ratios}")


def split_label_col(
    id_col,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    id_is_string: bool = False,
) -> Column:
    """Split label column: pure function of (id, seed, ratios)."""
    validate_ratios(ratios)
    h = hash31_str_col(id_col, seed) if id_is_string else hash31_col(id_col, seed)
    u = h.cast("double") / F.lit(float(M31))
    train_cut, val_cut = ratios[0], ratios[0] + ratios[1]
    return (
        F.when(u < F.lit(float(train_cut)), F.lit("train"))
        .when(u < F.lit(float(val_cut)), F.lit("validation"))
        .otherwise(F.lit("test"))
    )


def split_label_sql(
    id_sql: str,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    id_is_string: bool = False,
) -> str:
    """DuckDB twin of :func:`split_label_col`."""
    validate_ratios(ratios)
    h = hash31_str_sql(id_sql, seed) if id_is_string else hash31_sql(id_sql, seed)
    u = f"(CAST({h} AS DOUBLE) / {float(M31)!r})"
    train_cut, val_cut = ratios[0], ratios[0] + ratios[1]
    return (
        f"CASE WHEN {u} < {float(train_cut)!r} THEN 'train' "
        f"WHEN {u} < {float(val_cut)!r} THEN 'validation' ELSE 'test' END"
    )


class FileSplitStore:
    """Persisted split-assignment store (``FileSplitStore``,
    src/splits.rs:563-611): the assignment table (id, split) is written as
    parquet next to a JSON meta file carrying (seed, ratios, version); a
    seed or ratio mismatch on open is an ERROR, not a silent re-derivation
    — changing either would silently reshuffle every split downstream.
    Publication is write-temp-then-rename on the meta (the parquet
    directory write is already atomic-by-rename in Spark's committer)."""

    META = "split_store.json"

    def __init__(self, path: str, seed: int, ratios: tuple[float, float, float] = DEFAULT_RATIOS):
        validate_ratios(ratios)
        self.path, self.seed, self.ratios = path, seed, tuple(ratios)
        self._migrations = 0  # bumped by save_with_migration_audit

    def _meta_path(self) -> str:
        import os

        return os.path.join(self.path, self.META)

    def save(self, assignments: DataFrame) -> None:
        """Persist (id, split) rows; id may be any type castable to string."""
        import json
        import os

        os.makedirs(self.path, exist_ok=True)
        assignments.select(
            F.col("id").cast("string").alias("id"), F.col("split").cast("string").alias("split")
        ).write.mode("overwrite").parquet(os.path.join(self.path, "assignments"))
        # a plain save() must not reset the migration counter a previous
        # save_with_migration_audit recorded (fresh instances start at 0)
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                self._migrations = max(
                    self._migrations, int(json.load(f).get("migrations", 0))
                )
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "seed": self.seed,
                    "ratios": list(self.ratios),
                    "version": 1,
                    "migrations": self._migrations,
                },
                f,
            )
        os.replace(tmp, self._meta_path())

    def load(self, spark) -> DataFrame:
        """Load assignments, guarding the (seed, ratios) contract."""
        import json
        import os

        with open(self._meta_path()) as f:
            meta = json.load(f)
        if meta["seed"] != self.seed:
            raise ValueError(f"seed mismatch: store {meta['seed']} != config {self.seed}")
        if tuple(meta["ratios"]) != self.ratios:
            raise ValueError(f"ratio mismatch: store {meta['ratios']} != config {list(self.ratios)}")
        return spark.read.parquet(os.path.join(self.path, "assignments"))

    def exists(self) -> bool:
        import os

        return os.path.exists(self._meta_path())

    def save_with_migration_audit(
        self, spark, new_splits: DataFrame
    ) -> DataFrame | None:
        """Persist new (cluster-aware) assignments AND record every id whose
        label moved as an explicit override row — the auditable trail for
        the one legal relabel: corpus growth merging near-dup clusters
        ACROSS the old split boundary (``cluster_aware_splits`` docstring —
        keeping the old label there IS leakage, so the relabel must happen,
        but it must never happen silently).

        ``new_splits`` needs columns (id, split) and may carry (rep,
        cluster_size) — carried into the audit when present. Moved rows are
        written under ``overrides/migration=N`` BEFORE the assignments
        directory is overwritten (the diff plan reads the old parquet — a
        distributed write, never a driver collect), then the assignments
        and meta are replaced. Returns the moved frame read back from the
        audit dir, or ``None`` on first save. The full audit history loads
        with :meth:`load_migration_audit`."""
        import json
        import os

        extra = [c for c in ("rep", "cluster_size") if c in new_splits.columns]
        new_asn = new_splits.select(
            F.col("id").cast("string").alias("id"),
            F.col("split").cast("string").alias("split"),
            *extra,
        )
        moved_dir = None
        if self.exists():
            with open(self._meta_path()) as f:
                meta = json.load(f)
            migration = int(meta.get("migrations", 0)) + 1
            old = self.load(spark).select(
                F.col("id").cast("string").alias("id"),
                F.col("split").alias("old_split"),
            )
            moved = (
                old.join(new_asn.withColumnRenamed("split", "new_split"), "id", "inner")
                .where(F.col("old_split") != F.col("new_split"))
            )
            moved_dir = os.path.join(self.path, "overrides", f"migration={migration}")
            moved.write.mode("overwrite").parquet(moved_dir)
            self._migrations = migration
        self.save(new_asn)
        if moved_dir is not None:
            return spark.read.parquet(moved_dir)
        return None

    def load_migration_audit(self, spark) -> DataFrame | None:
        """All recorded relabel rows across migrations (None if none) —
        the ``migration`` partition column orders the history."""
        import os

        base = os.path.join(self.path, "overrides")
        if not os.path.exists(base):
            return None
        return spark.read.option("basePath", base).parquet(base)


def with_split(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    id_is_string: bool = False,
    overrides: DataFrame | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Attach the derived split column; optional explicit overrides
    (``upsert`` semantics, src/splits.rs:122-131) win over the derivation."""
    derived = split_label_col(id_col, seed, ratios, id_is_string)
    if overrides is None:
        return df.withColumn(out_col, derived)
    ov = overrides.select(
        F.col("id").alias("__ov_id"), F.col("split").alias("__ov_split")
    )
    return (
        df.join(F.broadcast(ov), F.col(id_col) == F.col("__ov_id"), "left")
        .withColumn(out_col, F.coalesce(F.col("__ov_split"), derived))
        .drop("__ov_id", "__ov_split")
    )


def cluster_aware_splits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    pairs: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Leakage-free split assignment: every near-duplicate CLUSTER lands
    on one side. Deriving the label from the raw id lets two near-copies
    of a document straddle train/test — the classic eval-contamination
    path a plain hash split cannot see. Here the label is derived from the
    cluster REPRESENTATIVE (connected components over MinHash-LSH pairs,
    :func:`~rust_triplets_spark.operators.dedup.neardup_clusters`), so all
    members inherit one label while singletons reduce to the ordinary
    id-hash split. Returns ``(id, rep, cluster_size, split)``.

    Determinism contract unchanged: the label is a pure function of
    ``(rep, seed, ratios)`` and reps are id-stable fixpoints, so labels
    stay stable as the corpus grows — unless new documents join a cluster
    ACROSS the old boundary, which is exactly the case that must re-label
    (the alternative IS leakage). Scale shape = neardup_clusters
    (O(log n) label propagation, bucketed pairs) + pure column arithmetic.
    """
    from rust_triplets_spark.operators.dedup import neardup_clusters

    labels = neardup_clusters(df, id_col, text_col, pairs=pairs, max_iter=max_iter)
    return labels.select(
        "id",
        "rep",
        "cluster_size",
        split_label_col(F.col("rep"), seed, ratios, id_is_string=False).alias("split"),
    )


def cluster_aware_splits_sql(
    table: str,
    id_sql: str,
    text_sql: str,
    seed: int = 42,
    ratios: tuple[float, float, float] = DEFAULT_RATIOS,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    minhash_seed: int | None = None,
) -> str:
    """DuckDB twin of :func:`cluster_aware_splits`: the recursive-CTE
    closure of :func:`~rust_triplets_spark.operators.dedup
    .neardup_clusters_sql` with the split cut applied to ``rep``."""
    from rust_triplets_spark.operators.dedup import MINHASH_SEED, neardup_clusters_sql

    clusters = neardup_clusters_sql(
        table, id_sql, text_sql, num_hashes, bands, shingle_n,
        minhash_seed if minhash_seed is not None else MINHASH_SEED,
    )
    label = split_label_sql("rep", seed, ratios, id_is_string=False)
    return f"SELECT id, rep, cluster_size, {label} AS split FROM ({clusters})"
