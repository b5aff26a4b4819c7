"""Exact-parity test: compat audio mode vs the pure-Python reference oracle
on a generated metadata corpus — pair set, confidences, reasons, and
suggested_keep must all agree."""

from __future__ import annotations

import numpy as np
import pytest

from transcript_dedup import compat_oracle as O


def _gen_files(n: int, seed: int) -> list[dict]:
    rng = np.random.default_rng(seed)
    artists = ["The Kinks", "Miles Davis", "Björk", "AC/DC", "Nina Simone", "Tool"]
    titles = ["Blue in Green", "Waterloo Sunset", "Army of Me", "Lateralus", "Sinnerman", "Back in Black"]
    exts = [".mp3", ".flac", ".m4a"]
    files = []
    for i in range(n):
        a = artists[rng.integers(0, len(artists))]
        t = titles[rng.integers(0, len(titles))]
        style = rng.integers(0, 8)
        if style == 0:
            fn = f"{a} - {t}{exts[rng.integers(0,3)]}"
        elif style == 1:
            fn = f"{rng.integers(1,99):02d}. {a} - {t}.mp3"
        elif style == 2:
            fn = f"{a} - {t} (320).mp3"
        elif style == 3:
            fn = f"{a}_-_{t}.flac"
        elif style == 4:
            fn = f"{a} - {t} [Live].mp3"
        elif style == 5:  # typo for the levenshtein arm
            base = f"{a} - {t}"
            pos = int(rng.integers(0, len(base)))
            fn = base[:pos] + "x" + base[pos + 1 :] + ".mp3"
        elif style == 6:
            fn = f"track{i:04d}.mp3"  # unparseable filename
        else:
            fn = f"{t}.mp3"
        has_tags = rng.random() < 0.7
        dur = float(rng.integers(90, 400)) + float(rng.random())
        files.append(
            {
                "path": f"/music/{i:05d}/{fn}",
                "filename": fn,
                "size": int(rng.integers(1_000_000, 80_000_000)),
                "duration": None if rng.random() < 0.1 else dur + float(rng.integers(-8, 8)),
                "bitrate": int(rng.choice([0, 128000, 192000, 320000])) or None
                if rng.random() < 0.9
                else None,
                "sampleRate": int(rng.choice([44100, 48000])),
                "bitDepth": int(rng.choice([0, 16, 24])) or None,
                "title": (t if has_tags else ("" if rng.random() < 0.5 else None)),
                "artist": (a if has_tags else None),
                "album": (f"Album {rng.integers(0, 4)}" if rng.random() < 0.6 else ""),
                "year": int(rng.choice([0, 1971, 1994, 2003])),
                "trackNumber": int(rng.integers(0, 15)),
                "genre": ("Rock" if rng.random() < 0.5 else None),
                "format": "MPEG",
                "lossless": bool(rng.random() < 0.2),
                "scannedAt": "2026-01-01T00:00:00Z",
            }
        )
    files.sort(key=lambda f: f["path"])  # deterministic iteration order
    return files


@pytest.mark.parametrize("seed,n", [(3, 120), (17, 200)])
def test_compat_exact_parity(spark, seed, n):
    from transcript_dedup.compat_audio import find_duplicates_compat

    files = _gen_files(n, seed)
    want = O.find_duplicates(files, tol=5.0)

    schema = (
        "path string, filename string, size long, duration double, bitrate long,"
        "sampleRate long, bitDepth long, title string, artist string, album string,"
        "year long, trackNumber long, genre string, format string, lossless boolean,"
        "scannedAt string"
    )
    df = spark.createDataFrame(
        [
            tuple(
                f[k]
                for k in (
                    "path filename size duration bitrate sampleRate bitDepth title "
                    "artist album year trackNumber genre format lossless scannedAt"
                ).split()
            )
            for f in files
        ],
        schema,
    )
    got_rows = find_duplicates_compat(df, 5.0).collect()
    got = {
        (r["path_a"], r["path_b"]): (
            r["confidence"],
            r["match_reasons"],
            r["suggested_keep"],
        )
        for r in got_rows
    }
    assert set(got) == set(want), (
        len(got),
        len(want),
        list(set(got) ^ set(want))[:4],
    )
    for k, (conf, reasons, keep) in want.items():
        gc, gr, gk = got[k]
        assert gc == conf, (k, gc, conf)
        assert sorted(gr) == sorted(reasons), (k, gr, reasons)
        assert gk == keep, (k, gk, keep)


def test_normalize_filename_chain_parity():
    cases = [
        "01. Artist - Song (320).mp3",
        "Artist - Song [Live] (Remastered).flac",
        "128 some track 1999.mp3",
        "12-34_Track_Name[2].m4a",
        "320kbps - thing.mp3",
        "weird...(1).mp3",
        "",
        "noext",
    ]
    import pandas as pd

    from transcript_dedup.compat_audio import normalize_filename_col
    from transcript_dedup.session import get_spark

    spark = get_spark(master="local[2]", shuffle_partitions=2)
    df = spark.createDataFrame(pd.DataFrame({"f": cases}))
    got = [
        r["n"] for r in df.select(normalize_filename_col(df.f).alias("n")).collect()
    ]
    want = [O.normalize_filename(c) for c in cases]
    assert got == want
