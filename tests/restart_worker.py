"""Subprocess worker for the cross-process restart-equality test
(tests/test_restart_equality.py — reference parity:
tests/shuffled_persistence.rs:681, tests/invariants.rs:362-407).

Runs in its OWN python process → its own JVM/SparkSession, so resuming
here proves the continuation state really round-trips through the on-disk
checkpoint (seed, epoch, step) and not through any in-process object.

Usage: python tests/restart_worker.py <ckpt_path> <out_path> [max_batches]

Consumes the deterministic batch sequence over a small in-memory frame,
persisting the checkpoint after every batch; stops after ``max_batches``
batches (simulated kill mid-epoch) or runs to exhaustion. Appends one JSON
line ``[batch_idx, [ids...]]`` per batch to ``out_path``.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from rust_triplets_spark.plans.batches import Checkpoint, batch_iterator  # noqa: E402

SEED = 42
ROWS = [(f"r{i}", f"s{i % 3}") for i in range(40)]


def main() -> None:
    ckpt_path, out_path = sys.argv[1], sys.argv[2]
    max_batches = int(sys.argv[3]) if len(sys.argv) > 3 else -1

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(ROWS, "id string, source string")

    if os.path.exists(ckpt_path):
        ck = Checkpoint.load(ckpt_path, expect_seed=SEED)
    else:
        ck = Checkpoint(seed=SEED, epoch=0, step=0)

    n = 0
    with open(out_path, "a") as out:
        for idx, pdf in batch_iterator(df, "id", "source", ck, batch_size=8):
            out.write(json.dumps([int(idx), pdf["id"].tolist()]) + "\n")
            out.flush()
            # trainer-driven commit (the reference's model: the trainer
            # persists sampler state after each completed step) — commit
            # batch idx EXACTLY when its output is durable, so the
            # restart sequence has no replay and no gap. batch_iterator's
            # checkpoint_path auto-save is the at-least-once convenience
            # (commits k when k+1 is requested); exactly-once restart
            # equality requires the consumer to own the commit point.
            Checkpoint(seed=ck.seed, epoch=ck.epoch, step=int(idx) + 1).save(
                ckpt_path
            )
            n += 1
            if max_batches >= 0 and n >= max_batches:
                # simulated kill: leave without closing the iterator or the
                # session cleanly — the checkpoint on disk is all that the
                # resuming process may rely on
                os._exit(0)
    spark.stop()


if __name__ == "__main__":
    main()
