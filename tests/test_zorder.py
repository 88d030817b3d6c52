"""Z-order layout operator (operators/zorder.py): the interleave and
quantize kernels pinned by hand, engine parity via the registered oracle
(check_correctness covers it), and the layout CLAIM itself — that
z-ordering cuts files-scanned for multi-dimensional probes — asserted on
clustered synthetic data."""

import numpy as np
import pytest

from rust_triplets_spark.operators.zorder import (
    quantize_col,
    zorder_key_col,
    zorder_pruning_audit,
)


def _morton2(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


class TestKernels:
    def test_interleave_hand_values(self, spark):
        from pyspark.sql import functions as F

        rows = [(3, 5), (0, 0), (255, 255), (1, 0), (0, 1), (170, 85)]
        df = spark.createDataFrame(rows, "a long, b long").select(
            "a", "b", zorder_key_col(F.col("a"), F.col("b"), 8).alias("z")
        )
        for r in df.collect():
            assert r["z"] == _morton2(r["a"], r["b"], 8), (r["a"], r["b"])

    def test_interleave_is_monotone_in_blocks(self):
        # points in the same quantized cell get the same z; z of a cell
        # grows with either coordinate's high bits (curve locality)
        assert _morton2(0, 0, 8) < _morton2(0, 1, 8) < _morton2(1, 0, 8)
        assert _morton2(128, 0, 8) > _morton2(127, 255, 8)

    def test_quantize_bounds(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(0,), (999_999,), (500_000,), (1,)], "v long"
        ).crossJoin(
            spark.createDataFrame([(0, 999_999)], "vmin long, vmax long")
        )
        got = {
            r["v"]: r["q"]
            for r in df.select(
                "v", quantize_col("v", "vmin", "vmax", 8).alias("q")
            ).collect()
        }
        assert got[0] == 0
        assert got[999_999] == 255
        assert got[500_000] == 128
        assert got[1] == 0

    def test_quantize_range_overflow_raises(self, spark):
        # r10 advice: value ranges >= 2^(63-bits) would silently wrap on
        # Spark's non-ANSI BIGINT multiply while DuckDB raises — the
        # guard makes Spark fail loudly too instead of diverging
        df = spark.createDataFrame([(0,)], "v long").crossJoin(
            spark.createDataFrame(
                [(0, (1 << 55) + 7)], "vmin long, vmax long"
            )
        )
        with pytest.raises(Exception, match="overflows BIGINT"):
            df.select(
                quantize_col("v", "vmin", "vmax", 8).alias("q")
            ).collect()

    def test_quantize_range_just_under_bound_ok(self, spark):
        # the guard is strict: a range one under 2^(63-bits) still works
        hi = (1 << 55) - 2  # vmax - vmin = 2^55 - 2 < 2^55
        df = spark.createDataFrame([(0,), (hi,)], "v long").crossJoin(
            spark.createDataFrame([(0, hi)], "vmin long, vmax long")
        )
        got = sorted(
            r["q"]
            for r in df.select(
                quantize_col("v", "vmin", "vmax", 8).alias("q")
            ).collect()
        )
        assert got == [0, 255]

    def test_quantize_epoch_micros_no_float_loss(self, spark):
        # epoch-micro magnitudes (~1.7e15) * 256 overflow double mantissa;
        # the DIV form must stay exact where float division would round
        base = 1_700_000_000_000_000
        vals = [(base + k,) for k in range(0, 1024, 7)]
        df = spark.createDataFrame(vals, "v long").crossJoin(
            spark.createDataFrame(
                [(base, base + 1023)], "vmin long, vmax long"
            )
        )
        for r in df.select(
            "v", quantize_col("v", "vmin", "vmax", 8).alias("q")
        ).collect():
            assert r["q"] == (r["v"] - base) * 256 // 1024


class TestLayoutClaim:
    def test_zorder_beats_linear_on_cells(self, spark):
        # synthetic: ids are arrival order, dimension a cycles fast
        # (users round-robin) while b tracks arrival (time) — the classic
        # shape where arrival layout is terrible for per-user probes
        rng = np.random.default_rng(9)
        n = 8000
        rows = [
            (i, int(rng.integers(0, 1000)), i * 1000 + int(rng.integers(0, 500)))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, user long, t long")
        audit = {
            (r["probe_kind"], r["probe_id"]): r.asDict()
            for r in zorder_pruning_audit(df, "id", "user", "t").collect()
        }
        # per-user-slice probes: z-order must scan strictly fewer files
        for pid in range(4):
            a = audit[("a_slice", pid)]
            assert a["files_zorder"] < a["files_linear"], a
        # combined cells: z-order at or below linear on every cell, and
        # strictly better in aggregate
        cells = [audit[("cell", pid)] for pid in range(4)]
        assert all(c["files_zorder"] <= c["files_linear"] for c in cells)
        assert sum(c["files_zorder"] for c in cells) < sum(
            c["files_linear"] for c in cells
        )
        # sanity: probe workload is complete and file totals are pinned
        assert len(audit) == 12
        assert all(v["files_total"] == 32 for v in audit.values())

    def test_empty_frame(self, spark):
        df = spark.createDataFrame([], "id long, user long, t long")
        assert zorder_pruning_audit(df, "id", "user", "t").count() == 0


class TestCompaction:
    def test_adjacent_packing_and_fill(self, spark):
        from rust_triplets_spark.operators.zorder import compaction_plan

        # files of 60/60/60/120/300/10 bytes, target 128:
        # cum-before: 0,60,120,180,300,600 → groups 0,0,0,1,2,4
        rows = [(0, 60), (1, 60), (2, 60), (3, 120), (4, 300), (5, 10)]
        df = spark.createDataFrame(rows, "file_id long, size_bytes long")
        got = {
            r["out_group"]: (r["n_files"], r["total_bytes"], r["fill_milli"])
            for r in compaction_plan(
                df, "file_id", "size_bytes", target_bytes=128
            ).collect()
        }
        assert got == {
            0: (3, 180, 1406),  # packs past the boundary, then cuts
            1: (1, 120, 937),
            2: (1, 300, 2343),  # oversized file alone
            4: (1, 10, 78),     # tail
        }

    def test_order_preservation_is_the_contract(self, spark):
        # shuffled input rows — grouping depends only on file_id order
        from rust_triplets_spark.operators.zorder import compaction_plan

        rows = [(2, 60), (0, 60), (3, 120), (1, 60), (5, 10), (4, 300)]
        df = spark.createDataFrame(rows, "file_id long, size_bytes long")
        got = sorted(
            (r["out_group"], r["n_files"]) for r in compaction_plan(
                df, "file_id", "size_bytes", target_bytes=128
            ).collect()
        )
        assert got == [(0, 3), (1, 1), (2, 1), (4, 1)]


class TestHilbert:
    def test_reference_walk_and_bijection(self):
        from rust_triplets_spark.operators.zorder import hilbert_d_py

        # the 2x2 U and full 8x8 bijection with unit steps
        assert [hilbert_d_py(x, y, 1)
                for x, y in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [0, 1, 2, 3]
        pos = {hilbert_d_py(x, y, 3): (x, y)
               for x in range(8) for y in range(8)}
        assert sorted(pos) == list(range(64))
        for d in range(63):
            (x1, y1), (x2, y2) = pos[d], pos[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1

    def test_spark_key_matches_reference(self, spark):
        from rust_triplets_spark.operators.zorder import (
            hilbert_d_py,
            with_hilbert_key,
        )

        rows = [(a, b) for a in (0, 1, 7, 128, 255)
                for b in (0, 3, 64, 254, 255)]
        df = spark.createDataFrame(rows, "__qa long, __qb long")
        got = {
            (r["__qa"], r["__qb"]): r["h"]
            for r in with_hilbert_key(df, "__qa", "__qb", 8, "h").collect()
        }
        for a, b in rows:
            assert got[(a, b)] == hilbert_d_py(a, b, 8), (a, b)

    def test_hilbert_at_or_below_zorder_on_cells(self, spark):
        import numpy as np

        from rust_triplets_spark.operators.zorder import zorder_pruning_audit

        rng = np.random.default_rng(21)
        n = 8000
        rows = [
            (i, int(rng.integers(0, 1000)),
             i * 1000 + int(rng.integers(0, 500)))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, user long, t long")
        audit = {
            (r["probe_kind"], r["probe_id"]): r.asDict()
            for r in zorder_pruning_audit(df, "id", "user", "t").collect()
        }
        cells = [audit[("cell", pid)] for pid in range(4)]
        # the curve-locality claim: hilbert never worse than morton on
        # combined cells, strictly better in aggregate on this shape
        assert all(c["files_hilbert"] <= c["files_zorder"] for c in cells)
        assert sum(c["files_hilbert"] for c in cells) <= sum(
            c["files_zorder"] for c in cells
        )


class TestCdcApplyChanges:
    def test_tombstone_lww_and_counts(self, spark):
        from rust_triplets_spark.operators.zorder import cdc_apply_changes

        feed = spark.createDataFrame(
            [
                # key A: I then U — latest U survives, counts (2, 0)
                ("A", 1, 10, "I", "v1"),
                ("A", 1, 20, "U", "v2"),
                # key B: I, U, D — final delete tombstones the key
                ("B", 1, 10, "I", "v1"),
                ("B", 1, 20, "U", "v2"),
                ("B", 1, 30, "D", ""),
                # key C: D then I (delete then re-insert) — survives
                ("C", 1, 10, "D", ""),
                ("C", 1, 20, "I", "v9"),
                # key D: out-of-order I with an older seq after a newer U
                # must NOT resurrect old state (LWW by sequence)
                ("D", 1, 30, "U", "new"),
                ("D", 1, 5, "I", "old"),
            ],
            "k string, part int, seq long, op string, val string",
        )
        got = {
            r["k"]: r.asDict()
            for r in cdc_apply_changes(feed, ["k", "part"], ["seq"], "op")
            .collect()
        }
        assert set(got) == {"A", "C", "D"}
        assert got["A"]["val"] == "v2"
        assert (got["A"]["n_changes"], got["A"]["n_deletes"]) == (2, 0)
        assert got["C"]["val"] == "v9"
        assert (got["C"]["n_changes"], got["C"]["n_deletes"]) == (2, 1)
        assert got["D"]["val"] == "new"

    def test_seq_tie_break_uses_later_seq_cols(self, spark):
        from rust_triplets_spark.operators.zorder import cdc_apply_changes

        feed = spark.createDataFrame(
            [("A", 10, 1, "U", "first"), ("A", 10, 2, "U", "second")],
            "k string, seq long, sub long, op string, val string",
        )
        got = cdc_apply_changes(feed, ["k"], ["seq", "sub"], "op").collect()
        assert len(got) == 1 and got[0]["val"] == "second"
