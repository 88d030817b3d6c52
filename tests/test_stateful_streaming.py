"""Custom stateful sessionizer (applyInPandasWithState) — tracker-logic
tests against the batch twin.

NOTE: driving the operator through a live streaming query hangs in THIS
container (pyspark 4.1.2 local mode: the state-store delta-file commit in
``HDFSBackedStateStoreProvider``/RocksDB never completes for the
applyInPandasWithState path, while plain streaming aggs work — see
tests/test_streaming.py). The tracker function is therefore exercised
directly with a scripted GroupState; the streaming wiring itself is
covered by construction in ``stream_sessionize``.
"""

import pandas as pd

from rust_triplets_spark.streaming.stateful import make_session_tracker

US = 1_000_000


class FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_set = None

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

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _run(track, user, ts_batches, state):
    out = []
    for batch in ts_batches:
        pdfs = iter([pd.DataFrame({"ts": batch})])
        for pdf in track((user,), pdfs, state):
            out.extend(map(tuple, pdf.itertuples(index=False)))
    return out


def test_sessions_close_on_gap_and_persist_across_batches():
    track = make_session_tracker(gap_seconds=1800)
    st = FakeState()
    t0 = 1_700_000_000 * US
    # batch 1: 3 events 60s apart → one open session, nothing closed
    out = _run(track, 7, [[t0, t0 + 60 * US, t0 + 120 * US]], st)
    assert out == [] and st.exists and st.get == (3, t0, t0 + 120 * US)
    # batch 2: event 2h later → closes the first session, opens a new one
    t1 = t0 + 2 * 3600 * US
    out = _run(track, 7, [[t1]], st)
    assert out == [(7, 3, t0, (t0 + 120 * US))]
    assert st.get == (1, t1, t1)
    # two sessions inside ONE batch both resolve
    t2 = t1 + 2 * 3600 * US
    t3 = t2 + 2 * 3600 * US
    out = _run(track, 7, [[t2, t2 + 60 * US, t3]], st)
    assert out == [
        (7, 1, t1, t1),
        (7, 2, t2, (t2 + 60 * US)),
    ]
    assert st.get == (1, t3, t3)


def test_timeout_flushes_open_session():
    track = make_session_tracker(gap_seconds=1800)
    st = FakeState()
    t0 = 1_700_000_000 * US
    _run(track, 3, [[t0]], st)
    assert st.timeout_set == 1800 * 1000
    st.hasTimedOut = True
    out = list(track((3,), iter([]), st))
    rows = [tuple(r) for pdf in out for r in pdf.itertuples(index=False)]
    assert rows == [(3, 1, t0, t0)]
    assert not st.exists


def test_out_of_order_within_batch_sorted():
    track = make_session_tracker(gap_seconds=1800)
    st = FakeState()
    t0 = 1_700_000_000 * US
    _run(track, 1, [[t0 + 120 * US, t0, t0 + 60 * US]], st)
    assert st.get == (3, t0, t0 + 120 * US)  # sorted before folding
