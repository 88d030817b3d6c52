"""Cross-process restart equality (reference parity:
tests/shuffled_persistence.rs:681 proves sequence continuation across
process restarts; tests/invariants.rs:362-407 the uninterrupted twin).

The in-session resume test (test_sources_pipeline.test_batch_iterator_resumes)
never leaves the JVM; this one kills the driver PROCESS after k batches and
resumes in a brand-new process from the on-disk checkpoint alone, asserting
the concatenated batch sequence equals an uninterrupted single-process run
byte-for-byte. That is the whole point of collapsing resume state to
(seed, epoch, step): no RNG object, cursor, or cached frame to lose."""

import json
import os
import subprocess
import sys
import tempfile

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "restart_worker.py")


def _run_worker(ckpt: str, out: str, max_batches: int = -1) -> None:
    cmd = [sys.executable, WORKER, ckpt, out]
    if max_batches >= 0:
        cmd.append(str(max_batches))
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(WORKER)),
    )
    assert res.returncode == 0, f"worker failed:\n{res.stdout}\n{res.stderr}"


def _read(out: str) -> list[tuple[int, list[str]]]:
    with open(out) as f:
        return [tuple(json.loads(line)) for line in f if line.strip()]


def test_restart_equality_across_processes():
    with tempfile.TemporaryDirectory(prefix="restart_eq_") as d:
        # uninterrupted run: one fresh process, full epoch
        full_out = os.path.join(d, "full.jsonl")
        _run_worker(os.path.join(d, "full_ck.json"), full_out)
        full = _read(full_out)
        assert len(full) > 3, "fixture must span several batches"

        # interrupted run: process 1 consumes 3 batches then hard-exits;
        # process 2 (new JVM) resumes from the checkpoint file alone
        part_out = os.path.join(d, "part.jsonl")
        ckpt = os.path.join(d, "ck.json")
        _run_worker(ckpt, part_out, max_batches=3)
        ck_after = json.load(open(ckpt))
        assert ck_after["step"] == 3  # persisted after each batch
        _run_worker(ckpt, part_out)

        assert _read(part_out) == full  # sequence equality, ids and order
