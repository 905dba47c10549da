"""Winnowing document fingerprints: the MOSS guarantee (any shared
substring of length >= w + k - 1 produces a shared selected fingerprint)
plus a brute-force replication of the selection itself."""

import hashlib

from hilbert_curve_spark.operators.textops import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_selected,
)


def _brute_winnow(text: str, k: int, w: int) -> set[int]:
    """Reference winnowing in plain Python: 40-bit md5 fold per k-gram,
    min of each w-window, distinct."""
    if len(text) < k + w - 1:
        return set()
    hs = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:10], 16)
        for i in range(len(text) - k + 1)
    ]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_brute_force(spark):
    k, w = 4, 5
    texts = [
        ("d1", "the quick brown fox jumps over the lazy dog"),
        ("d2", "pack my box with five dozen liquor jugs"),
        ("d3", "aaaaaaaaaaaaaaaaaaaa"),  # degenerate: one distinct gram
        ("d4", "short"),  # below k + w - 1: excluded
    ]
    docs = spark.createDataFrame(texts, "doc_id string, text string")
    got = {
        r.doc_id: (r.n_fps, r.fp_fold)
        for r in winnow_fingerprints(docs, k, w).collect()
    }
    for doc_id, text in texts:
        want = _brute_winnow(text, k, w)
        if not want:
            assert doc_id not in got
        else:
            assert got[doc_id] == (len(want), sum(want) % (1 << 40)), doc_id


def test_winnow_guarantee_shared_substring(spark):
    """Two docs sharing a substring of length >= w + k - 1 MUST share a
    selected fingerprint (the paper's detection guarantee)."""
    k, w = WINNOW_K, WINNOW_W
    shared = "a distinctive shared passage long enough!"  # 42 >= k + w - 1 = 23
    docs = spark.createDataFrame(
        [
            ("a", "prefix text before it " + shared + " and trailing words"),
            ("b", shared + " entirely different continuation of document b"),
            ("c", "no overlap with the others whatsoever in this one here"),
        ],
        "doc_id string, text string",
    )
    sel = winnow_selected(docs, k, w)
    by_doc = {}
    for r in sel.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.m)
    assert by_doc["a"] & by_doc["b"], "guaranteed shared fingerprint missing"
    assert not (by_doc["a"] & by_doc["c"]) or len(by_doc["a"] & by_doc["c"]) < len(
        by_doc["a"] & by_doc["b"]
    )
