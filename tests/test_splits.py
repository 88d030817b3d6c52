"""Split-assignment invariants, ported from the reference's test strategy
(tests/invariants.rs:568-809, tests/split_persistence_file_stream.rs:97,
src/splits.rs:827-850 — see SURVEY §5 / FIXTURES F8)."""

import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_py, M31
from rust_triplets_spark.operators.splits import split_label_col, with_split


def _labels_py(n, seed, ratios):
    out = []
    for i in range(n):
        u = hash31_py(i, seed) / M31
        if u < ratios[0]:
            out.append("train")
        elif u < ratios[0] + ratios[1]:
            out.append("validation")
        else:
            out.append("test")
    return out


def test_ratio_convergence(spark):
    df = spark.range(20_000)
    counts = dict(
        df.groupBy(split_label_col("id", 42).alias("s")).count().collect()
    )
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.8) < 0.02
    assert abs(counts["validation"] / total - 0.1) < 0.01
    assert abs(counts["test"] / total - 0.1) < 0.01


def test_zero_test_ratio_never_assigns_test(spark):
    df = spark.range(20_000)
    counts = dict(
        df.groupBy(split_label_col("id", 42, (0.5, 0.5, 0.0)).alias("s")).count().collect()
    )
    assert "test" not in counts


def test_id_stability_under_growth(spark):
    """Labels must not change when the corpus grows (the reference's single
    most load-bearing invariant, src/config.rs:138-145)."""
    small = spark.range(1_000).withColumn("s", split_label_col("id", 42))
    big = spark.range(5_000).withColumn("s", split_label_col("id", 42))
    joined = small.alias("a").join(big.alias("b"), "id").where(F.col("a.s") != F.col("b.s"))
    assert joined.count() == 0


def test_matches_python_reference(spark):
    labels = [
        r[0]
        for r in spark.range(500)
        .select(split_label_col("id", 7))
        .collect()
    ]
    assert labels == _labels_py(500, 7, (0.8, 0.1, 0.1))


def test_overrides_win(spark):
    df = spark.range(100).select(F.col("id").cast("long").alias("id"))
    ov = spark.createDataFrame([(5, "test"), (6, "train")], "id long, split string")
    out = with_split(df, "id", overrides=ov)
    got = {r["id"]: r["split"] for r in out.collect()}
    assert got[5] == "test" and got[6] == "train"


def test_invalid_ratios_rejected(spark):
    with pytest.raises(ValueError):
        split_label_col("id", 42, (0.5, 0.2, 0.1))


def test_file_split_store_roundtrip_and_guards(spark, tmp_path):
    """FileSplitStore persistence (src/splits.rs:563-611): parquet
    assignment table + meta guard — seed/ratio mismatch on open errors
    instead of silently re-deriving."""
    import pytest

    from rust_triplets_spark.operators.splits import FileSplitStore

    df = spark.createDataFrame(
        [(str(i), "train" if i % 2 else "test") for i in range(20)], "id string, split string"
    )
    store = FileSplitStore(str(tmp_path / "store"), seed=42)
    store.save(df)

    loaded = FileSplitStore(str(tmp_path / "store"), seed=42).load(spark)
    assert {(r["id"], r["split"]) for r in loaded.collect()} == {
        (str(i), "train" if i % 2 else "test") for i in range(20)
    }

    with pytest.raises(ValueError, match="seed mismatch"):
        FileSplitStore(str(tmp_path / "store"), seed=7).load(spark)
    with pytest.raises(ValueError, match="ratio mismatch"):
        FileSplitStore(str(tmp_path / "store"), seed=42, ratios=(0.5, 0.25, 0.25)).load(spark)


def test_cluster_aware_splits_no_neardup_leakage(spark):
    """Near-dup cluster members share ONE split label; singletons get the
    plain deterministic id split."""
    from rust_triplets_spark.operators.dedup import minhash_lsh_pairs
    from rust_triplets_spark.operators.splits import (
        cluster_aware_splits, split_label_col,
    )
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base.replace("today", "tomorrow")),
            (3, "entirely different text about query planners and shuffles"),
            (4, base.replace("quick", "rapid"))]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in cluster_aware_splits(df, "id", "text").collect()}
    assert len(out) == 4
    # the near-dup family {1,2,4} forms one cluster -> one label
    fam = {out[i]["rep"] for i in (1, 2, 4)}
    assert fam == {1}
    assert out[1]["split"] == out[2]["split"] == out[4]["split"]
    # singleton: label == plain id-hash split of its own id (rep == id)
    plain = df.where(F.col("id") == 3).select(
        split_label_col(F.col("id"), 42).alias("s")).collect()[0]["s"]
    assert out[3]["split"] == plain and out[3]["rep"] == 3

    # leakage audit: NO minhash candidate pair may straddle splits
    pairs = minhash_lsh_pairs(df, "id", "text").collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        assert out[p["a"]]["split"] == out[p["b"]]["split"]


def test_cluster_split_migration_audit(spark, tmp_path):
    """VERDICT r5 #6: corpus growth that merges near-dup clusters ACROSS an
    old split boundary must relabel (keeping the old label is leakage) but
    never silently — moved ids land as explicit override rows the store
    can replay. The audit frame must equal the label diff exactly."""
    from rust_triplets_spark.operators.splits import (
        FileSplitStore,
        cluster_aware_splits,
    )

    docs = [(i, f"document number {i} with unique content {i * 7}") for i in range(40)]
    df = spark.createDataFrame(docs, "id long, text string")
    no_pairs = spark.createDataFrame([], "a long, b long")

    store = FileSplitStore(str(tmp_path / "store"), seed=42)
    first = cluster_aware_splits(df, "id", "text", pairs=no_pairs)
    assert store.save_with_migration_audit(spark, first) is None  # first save: no audit
    labels0 = {r["id"]: r["split"] for r in first.collect()}

    # pick two singletons on opposite sides of the boundary and bridge them
    train_id = min(i for i, s in labels0.items() if s == "train")
    test_id = min(i for i, s in labels0.items() if s == "test")
    bridge = spark.createDataFrame([(min(train_id, test_id), max(train_id, test_id))], "a long, b long")

    second = cluster_aware_splits(df, "id", "text", pairs=bridge)
    labels1 = {r["id"]: r["split"] for r in second.collect()}
    expected_moved = {
        str(i): (labels0[i], labels1[i]) for i in labels0 if labels0[i] != labels1[i]
    }
    assert expected_moved  # the bridge must actually move someone

    moved = store.save_with_migration_audit(spark, second)
    got = {r["id"]: (r["old_split"], r["new_split"]) for r in moved.collect()}
    assert got == expected_moved
    # audit rows carry the cluster context
    assert {"rep", "cluster_size"} <= set(moved.columns)

    # history loads with the migration partition; a plain save() must not
    # reset the counter
    audit = store.load_migration_audit(spark)
    assert {r["migration"] for r in audit.collect()} == {1}
    store.save(second)
    store2 = FileSplitStore(str(tmp_path / "store"), seed=42)
    third = store2.save_with_migration_audit(spark, second)
    assert third.count() == 0  # no diff — but counter advanced to 2
    import json, os
    meta = json.load(open(os.path.join(str(tmp_path / "store"), "split_store.json")))
    assert meta["migrations"] == 2
