"""Line-level corpus cleaning (operators/lines.py) and exact group
quantiles (operators/quality.py::group_quantiles)."""

import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.operators.lines import (
    boilerplate_line_dedup,
    c4_line_filter,
)
from rust_triplets_spark.operators.quality import group_quantiles


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id: long, text: string")


FOOTER = "subscribe to our newsletter"


class TestBoilerplateLineDedup:
    def test_frequent_line_removed_everywhere(self, spark):
        rows = [(i, f"unique content line {i}\n{FOOTER}") for i in range(5)]
        out = boilerplate_line_dedup(_docs(spark, rows), "id", "text", 3).collect()
        assert len(out) == 5
        for r in out:
            assert r.n_lines == 2 and r.n_removed == 1
            assert r.clean_text == f"unique content line {r.id}"

    def test_below_threshold_kept(self, spark):
        rows = [(1, f"a\n{FOOTER}"), (2, f"b\n{FOOTER}"), (3, "c")]
        out = {
            r.id: r
            for r in boilerplate_line_dedup(_docs(spark, rows), "id", "text", 3).collect()
        }
        assert out[1].n_removed == 0 and FOOTER in out[1].clean_text

    def test_repeat_within_one_doc_not_boilerplate(self, spark):
        # corpus frequency counts DISTINCT docs, not occurrences
        rows = [(1, "same\nsame\nsame"), (2, "other")]
        out = {
            r.id: r
            for r in boilerplate_line_dedup(_docs(spark, rows), "id", "text", 2).collect()
        }
        assert out[1].n_removed == 0

    def test_empty_lines_never_removed(self, spark):
        rows = [(i, "top\n\nbottom") for i in range(4)]
        out = boilerplate_line_dedup(_docs(spark, rows), "id", "text", 2).collect()
        # 'top'/'bottom' are boilerplate (4 docs); the blank line survives
        for r in out:
            assert r.n_removed == 2 and r.clean_text == ""  # blank line remains

    def test_order_preserved(self, spark):
        rows = [(1, "z last\na first\nm mid"), (2, "x")]
        r = (
            boilerplate_line_dedup(_docs(spark, rows), "id", "text", 2)
            .where(F.col("id") == 1)
            .head()
        )
        assert r.clean_text == "z last\na first\nm mid"

    def test_min_docs_validation(self, spark):
        with pytest.raises(ValueError):
            boilerplate_line_dedup(_docs(spark, [(1, "x")]), "id", "text", 1)


class TestC4LineFilter:
    def test_line_gates(self, spark):
        text = "\n".join(
            [
                "This line ends properly.",  # kept
                "short.",  # < 3 words
                "no terminal punctuation here",  # no punct
                "Another good sentence here!",  # kept
                'He said "stop right there."',  # kept (quote counts? ends with .)
            ]
        )
        r = c4_line_filter(_docs(spark, [(1, text)]), "id", "text", 3, 1).head()
        assert r.n_lines == 5 and r.n_kept == 3 and r.doc_kept
        assert "short." not in r.clean_text

    def test_min_kept_gate(self, spark):
        r = c4_line_filter(
            _docs(spark, [(1, "Only one good line here.")]), "id", "text", 3, 3
        ).head()
        assert r.n_kept == 1 and not r.doc_kept

    def test_lorem_and_brace_gates(self, spark):
        good = "A fine sentence one.\nA fine sentence two.\nA fine sentence three."
        rows = [
            (1, good),
            (2, good + "\nsome Lorem Ipsum filler text."),
            (3, good + "\nif (x) { y(); }"),
        ]
        out = {r.id: r for r in c4_line_filter(_docs(spark, rows), "id", "text").collect()}
        assert out[1].doc_kept
        assert not out[2].doc_kept  # case-insensitive lorem ipsum
        assert not out[3].doc_kept  # code brace

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            c4_line_filter(_docs(spark, [(1, "x")]), "id", "text", 0, 1)


class TestGroupQuantiles:
    def test_known_values(self, spark):
        df = spark.createDataFrame(
            [("a", v) for v in range(1, 11)] + [("b", 7)], "g: string, v: long"
        )
        out = {r.g: r for r in group_quantiles(df, "g", "v").collect()}
        a = out["a"]
        # type-1 quantile: value at rank ceil(f*n), n=10
        assert (a.n, a.min_v, a.max_v) == (10, 1, 10)
        assert (a.q_25, a.q_50, a.q_75, a.q_90) == (3, 5, 8, 9)
        b = out["b"]
        assert (b.q_25, b.q_50, b.q_75, b.q_90) == (7, 7, 7, 7)

    def test_rank_is_integer_arithmetic(self, spark):
        # n=5 with f=9/10: ceil(4.5) = 5 exactly — no float rank drift
        df = spark.createDataFrame([("a", v) for v in (10, 20, 30, 40, 50)], "g: string, v: long")
        r = group_quantiles(df, "g", "v").head()
        assert r.q_90 == 50

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1)], "g: string, v: long")
        with pytest.raises(ValueError):
            group_quantiles(df, "g", "v", fractions=())
        with pytest.raises(ValueError):
            group_quantiles(df, "g", "v", fractions=((3, 2),))


from rust_triplets_spark.operators.mixing import (  # noqa: E402
    budgeted_source_sample,
    waterfill_allocation,
)


def _counts(spark, pairs):
    return spark.createDataFrame(pairs, "grp: string, c: long")


class TestWaterfillAllocation:
    def _check(self, spark, pairs, budget):
        out = waterfill_allocation(_counts(spark, pairs), "grp", "c", budget).collect()
        total_c = sum(c for _, c in pairs)
        by = {r.grp: r for r in out}
        # invariant 1: exact budget (or everything, if budget exceeds corpus)
        assert sum(r.alloc for r in out) == min(budget, total_c)
        # invariant 2: never over-allocate a group
        assert all(r.alloc <= r.c for r in out)
        # invariant 3: funded groups keep everything
        assert all(r.alloc == r.c for r in out if r.funded)
        # invariant 4: max-min fairness — every capped alloc >= any funded c
        capped = [r.alloc for r in out if not r.funded]
        funded_c = [r.c for r in out if r.funded]
        if capped and funded_c:
            assert min(capped) >= max(funded_c)
        # invariant 5: capped allocations differ by at most 1
        if capped:
            assert max(capped) - min(capped) <= 1
        return by

    def test_all_funded(self, spark):
        by = self._check(spark, [("a", 5), ("b", 10), ("c", 3)], 100)
        assert all(by[g].funded for g in "abc")

    def test_all_capped(self, spark):
        by = self._check(spark, [("a", 50), ("b", 60), ("c", 70)], 31)
        # 31 over 3 groups: level 10, remainder 1 to the first capped group
        assert sorted(r.alloc for r in by.values()) == [10, 10, 11]

    def test_mixed(self, spark):
        by = self._check(spark, [("tiny", 2), ("small", 8), ("big", 100), ("huge", 200)], 60)
        assert by["tiny"].funded and by["small"].funded
        assert not by["big"].funded and not by["huge"].funded
        assert by["tiny"].alloc == 2 and by["small"].alloc == 8
        assert by["big"].alloc + by["huge"].alloc == 50

    def test_zero_budget(self, spark):
        by = self._check(spark, [("a", 5), ("b", 7)], 0)
        assert all(r.alloc == 0 for r in by.values())

    def test_validation(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            waterfill_allocation(_counts(spark, [("a", 1)]), "grp", "c", -1)


class TestBudgetedSourceSample:
    def test_exact_budget_and_determinism(self, spark):
        rows = [(i, f"s{i % 4}") for i in range(100)]
        df = spark.createDataFrame(rows, "id: long, source: string")
        out1 = budgeted_source_sample(df, "id", "source", 40, seed=7)
        got1 = sorted((r.id, r.source) for r in out1.collect())
        assert len(got1) == 40
        got2 = sorted(
            (r.id, r.source)
            for r in budgeted_source_sample(df, "id", "source", 40, seed=7).collect()
        )
        assert got1 == got2  # pure function of (data, seed)
        per_src = {}
        for _, s in got1:
            per_src[s] = per_src.get(s, 0) + 1
        assert all(v == 10 for v in per_src.values())  # 4 even sources, level 10

    def test_rank_contiguous(self, spark):
        rows = [(i, "only") for i in range(20)]
        df = spark.createDataFrame(rows, "id: long, source: string")
        out = budgeted_source_sample(df, "id", "source", 5, seed=1).collect()
        assert sorted(r.rank for r in out) == [1, 2, 3, 4, 5]


class TestGroupQuantilesEdge:
    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", 1), ("a", 2), ("a", 3)], "g: string, v: long"
        )
        r = group_quantiles(df, "g", "v").head()
        # NULLs never rank (Spark NULLS FIRST vs DuckDB NULLS LAST would
        # diverge); n counts non-null values only
        assert r.n == 3 and r.q_25 == 1 and r.min_v == 1

    def test_duplicate_pct_rejected(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([("a", 1)], "g: string, v: long")
        with _pytest.raises(ValueError, match="q_33"):
            group_quantiles(df, "g", "v", fractions=((1, 3), (333, 1000)))


class TestTemperatureSourceMix:
    def _mix(self, spark, pairs, budget, alpha):
        from rust_triplets_spark.operators.mixing import temperature_source_mix

        df = spark.createDataFrame(pairs, "grp: string, c: long")
        return {r.grp: r for r in temperature_source_mix(
            df, "grp", "c", budget, alpha).collect()}

    def test_exact_budget_and_upsampling(self, spark):
        by = self._mix(spark, [("big", 100000), ("small", 100)], 1000, 0.3)
        assert sum(r.alloc for r in by.values()) == 1000
        # alpha=0.3 upsamples the small source far above its 0.1% share
        share_small = by["small"].alloc / 1000
        assert share_small > 0.1
        # ...but the big source still gets more than the small one
        assert by["big"].alloc > by["small"].alloc

    def test_alpha_zero_is_uniform(self, spark):
        by = self._mix(spark, [("a", 10), ("b", 1000), ("c", 99999)], 9, 0.0)
        assert [by[g].alloc for g in "abc"] == [3, 3, 3]

    def test_alpha_one_is_proportional(self, spark):
        by = self._mix(spark, [("a", 100), ("b", 300)], 100, 1.0)
        assert by["a"].alloc == 25 and by["b"].alloc == 75

    def test_remainder_is_deterministic(self, spark):
        # 10 over 3 equal sources: base 3 each, 1 spare -> first group asc
        by = self._mix(spark, [("x", 5), ("y", 5), ("z", 5)], 10, 1.0)
        assert sum(r.alloc for r in by.values()) == 10
        assert sorted(r.alloc for r in by.values()) == [3, 3, 4]

    def test_validation(self, spark):
        import pytest as _pytest
        from rust_triplets_spark.operators.mixing import temperature_source_mix

        df = spark.createDataFrame([("a", 1)], "grp: string, c: long")
        with _pytest.raises(ValueError):
            temperature_source_mix(df, "grp", "c", -1)
        with _pytest.raises(ValueError):
            temperature_source_mix(df, "grp", "c", 10, alpha=-0.5)

    def test_all_zero_counts_allocate_zero(self, spark):
        # degenerate corpus (every count 0): all-zero allocation, not a
        # division-by-zero job abort
        by = self._mix(spark, [("a", 0), ("b", 0)], 10, 0.5)
        assert all(r.alloc == 0 for r in by.values())
