"""Metadata repair stage (metadata-fixer.ts analogue): inference, confidence,
S11 skip counters, and turn-role repair."""

from __future__ import annotations

from transcript_dedup.metadata_fixer import (
    find_missing_metadata,
    fix_document_metadata,
    fix_turn_roles,
)


def _docs(spark):
    rows = [
        # complete metadata -> untouched
        (1, "the cat sat on the mat and the dog is in the house", "en", "web"),
        # missing lang, English-looking -> inferred 'en', medium
        (2, "the quick brown fox is in the yard and the dog is a friend", "", "web"),
        # missing lang, no stopwords -> uninferable -> skipped, low
        (3, "zzz qqq www rrr ttt yyy", None, "web"),
        # missing source -> leading token inferred, medium
        (4, "anthology of the great stories and the poems of the age", "en", None),
        # missing both; lang inferable, source inferable -> medium
        (5, "the story of the house and the cat in the garden", "", ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string, source string")


def test_find_missing(spark):
    got = {r["doc_id"] for r in find_missing_metadata(_docs(spark)).collect()}
    assert got == {2, 3, 4, 5}


def test_fix_document_metadata(spark):
    counters: dict = {}
    out = {r["doc_id"]: r for r in fix_document_metadata(_docs(spark), counters).collect()}
    assert out[1]["confidence"] == "" and out[1]["fixed_fields"] == ""
    assert out[2]["lang"] == "en" and out[2]["confidence"] == "medium"
    assert out[3]["lang"] is None and out[3]["skipped"] and out[3]["confidence"] == "low"
    assert out[4]["source"] == "inferred:anthology" and out[4]["confidence"] == "medium"
    assert out[5]["fixed_fields"] == "lang,source" and not out[5]["skipped"]
    assert counters["metadata_skipped"] == 1
    assert counters["metadata_fixed"] == 3


def test_fix_turn_roles(spark):
    turns = spark.createDataFrame(
        [("c1", 0, "", "hi"), ("c1", 1, None, "hello"), ("c1", 2, "system", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {r["turn_idx"]: (r["role"], r["role_inferred"]) for r in fix_turn_roles(turns).collect()}
    assert got[0] == ("user", True)
    assert got[1] == ("assistant", True)
    assert got[2] == ("system", False)


def test_region_broadcast_rollup_plan(spark):
    """S9 memo-cache analogue: the dim join must be a BroadcastHashJoin
    (dimension shipped once per executor, fact side never shuffled for it)."""
    import os

    import pytest

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    import __spark_entry__ as E

    df = E._q_region_broadcast_rollup(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_compat_long_filenames_blocking(spark):
    """Names longer than 10*LEN_BUCKET_W: the runtime-derived bucket width
    must keep the +/-1-bucket adjacency lossless (round-1 advice)."""
    from transcript_dedup.compat_audio import find_duplicates_compat

    stem = "word " * 140  # ~700 chars normalized, far beyond 320
    names = [f"{stem}one more tune.mp3", f"{stem}one more tone.mp3", "short.mp3"]

    def row(i, name):
        return (
            f"/m/{i}/{name}", name, 1000, 100.0, 128, 44100, 16,
            None, None, None, 0, 0, None, "MPEG", False, "2026-01-01T00:00:00Z",
        )

    schema = (
        "path string, filename string, size long, duration double, bitrate long,"
        "sampleRate long, bitDepth long, title string, artist string, album string,"
        "year long, trackNumber long, genre string, format string, lossless boolean,"
        "scannedAt string"
    )
    files = spark.createDataFrame([row(i, n) for i, n in enumerate(names)], schema)
    pairs = find_duplicates_compat(files).collect()
    assert {(r["path_a"], r["path_b"]) for r in pairs} == {
        (f"/m/0/{names[0]}", f"/m/1/{names[1]}")
    }, pairs
