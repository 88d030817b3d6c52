"""Blocklist gate invariants: word-boundary semantics (no substring
false positives), multi-word phrase counting, non-overlapping counts,
whitespace-normalization robustness, threshold flagging, and loud
validation."""

import pytest

from rust_triplets_spark.operators.blocklist import blocklist_hits


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BL = {"bad": ("bad actor", "rogue"), "meh": ("gray area",)}


def _got(spark, texts, **kw):
    return {
        r["doc_id"]: r.asDict()
        for r in blocklist_hits(
            _df(spark, texts), "doc_id", "text", blocklist=BL, **kw
        ).collect()
    }


def test_word_boundary_no_substring_match(spark):
    got = _got(spark, [
        "a bad actor appeared",       # hit
        "badly acting rogues here",   # 'rogues' != 'rogue', no hit
        "the rogue wave",             # hit
        "scrogue bad actors",         # neither ('scrogue', 'actors')
    ])
    assert got[0]["hits_bad"] == 1 and got[0]["flagged"] == 1
    assert got[1]["hits_bad"] == 0 and got[1]["flagged"] == 0
    assert got[2]["hits_bad"] == 1
    assert got[3]["hits_bad"] == 0


def test_multiword_and_normalization(spark):
    got = _got(spark, [
        "a  bad\tactor and a gray\narea",  # whitespace runs normalize
        "bad actor bad actor bad actor",   # 3 non-overlapping
    ])
    assert got[0]["hits_bad"] == 1 and got[0]["hits_meh"] == 1
    assert got[0]["total_hits"] == 2
    assert got[1]["hits_bad"] == 3


def test_edge_positions_and_empty(spark):
    got = _got(spark, [
        "rogue",              # entire doc is the phrase
        "rogue at the start",
        "ending with rogue",
        "",
    ])
    for d in range(3):
        assert got[d]["hits_bad"] == 1, d
    assert got[3]["total_hits"] == 0 and got[3]["flagged"] == 0


def test_threshold(spark):
    got = _got(spark, ["rogue here", "rogue rogue"], flag_threshold=2)
    assert got[0]["flagged"] == 0
    assert got[1]["flagged"] == 1


def test_bad_inputs_loud(spark):
    with pytest.raises(ValueError):
        blocklist_hits(_df(spark, ["x"]), "doc_id", "text", blocklist={"a": ()})
    with pytest.raises(ValueError):
        blocklist_hits(_df(spark, ["x"]), "doc_id", "text", flag_threshold=0)
