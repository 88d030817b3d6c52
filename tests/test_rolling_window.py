"""Bounded rolling record window (streaming LRU, src/ingestion.rs:137-186)
— tracker-logic tests with a scripted GroupState (live
applyInPandasWithState queries hang in this container; see
tests/test_stateful_streaming.py header)."""

import pandas as pd
import pytest

from rust_triplets_spark.streaming.rolling_window import make_rolling_window


class FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None


def _run(track, source, batches, state):
    out = []
    for ids in batches:
        pdfs = iter([pd.DataFrame({"record_id": ids, "seq": range(len(ids))})])
        for pdf in track((source,), pdfs, state):
            out.extend(map(tuple, pdf.itertuples(index=False)))
    return out


def test_lru_admit_refresh_evict():
    track = make_rolling_window(3)
    st = FakeState()
    out = _run(track, "s", [["a", "b", "c"]], st)
    assert out == [("s", "a", "admitted"), ("s", "b", "admitted"), ("s", "c", "admitted")]
    assert st.get == (["a", "b", "c"],)
    # re-ingest refreshes recency: a moves to MRU, then d evicts b (now LRU)
    out = _run(track, "s", [["a", "d"]], st)
    assert out == [
        ("s", "a", "refreshed"),
        ("s", "d", "admitted"),
        ("s", "b", "evicted"),
    ]
    assert st.get == (["c", "a", "d"],)


def test_zero_cap_discards_everything():
    track = make_rolling_window(0)
    st = FakeState()
    out = _run(track, "s", [["x", "y"]], st)
    assert out == [("s", "x", "discarded"), ("s", "y", "discarded")]
    assert not st.exists  # nothing retained


def test_state_persists_across_batches_and_negative_cap_rejected():
    track = make_rolling_window(2)
    st = FakeState()
    _run(track, "s", [["a"], ["b"], ["c"]], st)
    assert st.get == (["b", "c"],)
    with pytest.raises(ValueError):
        make_rolling_window(-1)


def test_seq_orders_within_batch():
    track = make_rolling_window(2)
    st = FakeState()
    # seq reversed vs list order: admission must follow seq
    pdfs = iter([pd.DataFrame({"record_id": ["late", "early"], "seq": [1, 0]})])
    out = []
    for pdf in track(("s",), pdfs, st):
        out.extend(map(tuple, pdf.itertuples(index=False)))
    assert [r[1] for r in out] == ["early", "late"]
    assert st.get == (["early", "late"],)


def test_streaming_wiring_builds(spark, tmp_path):
    """The applyInPandasWithState wiring constructs against a real stream
    source (plan-level check; execution is covered by the tracker tests)."""
    import pyspark.sql.types as T

    from rust_triplets_spark.streaming.rolling_window import stream_rolling_window

    schema = T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("seq", T.LongType()),
    ])
    df = stream_rolling_window(
        spark, str(tmp_path), schema, max_records=5, seq_col="seq"
    )
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["source", "record_id", "action"]


def test_group_spanning_multiple_chunks_orders_globally():
    """applyInPandasWithState delivers one group as several Arrow chunks;
    seq ordering must span the WHOLE group — per-chunk sorting admits in
    chunk order and evicts the wrong records."""
    track = make_rolling_window(2)
    st = FakeState()
    chunk1 = pd.DataFrame({"record_id": ["c", "d"], "seq": [2, 3]})
    chunk2 = pd.DataFrame({"record_id": ["a", "b"], "seq": [0, 1]})
    out = []
    for pdf in track(("s",), iter([chunk1, chunk2]), st):
        out.extend(map(tuple, pdf.itertuples(index=False)))
    # global seq order: a,b,c,d admitted in order; a,b evicted; c,d retained
    assert [r[1] for r in out if r[2] == "admitted"] == ["a", "b", "c", "d"]
    assert [r[1] for r in out if r[2] == "evicted"] == ["a", "b"]
    assert st.get == (["c", "d"],)
