"""Compatibility mode: the reference's own domain (audio file metadata),
distributed.

A user of ``adam-edison/audio-duplicate-finder`` brings a table shaped like
``AudioFileMetadata`` (/root/reference/src/types.ts:54-71) and gets the same
duplicate pairs, confidences, match reasons, and suggested-keep choices that
``findDuplicates`` (/root/reference/src/duplicates.ts:11-42) produces — but
from blocking joins instead of the O(n^2) single-threaded loop:

  candidates = union(
    artist+title equality block      (:97-108)
    parsed-filename equality block   (:110-121)
    normalized-filename equality     (:123-127)
    filename Levenshtein >= 0.9      (:129-139) via length-bucket block —
      lossless because sim >= 0.9 implies |len_a - len_b| <= 0.1 * max_len,
      and bucket width W covers every such pair with max_len <= 10 * W
  )
  verified + scored with the exact compareFiles semantics (weights 50/30/
  15/5, gate = artistTitle OR filename — code wins over README, SURVEY 2.11)

Exact-parity is asserted against a pure-Python oracle on generated corpora
(tests/test_compat_audio.py), including JS truthiness quirks: empty-string
tags and zero year/trackNumber/bitrate do not count (metadata.ts:63-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .normalize import normalize_text

#: duplicates.ts:178-185 separator priority (first separator FOUND in this
#: order wins, split at its first occurrence)
SEPARATORS = [" - ", " – ", " — ", "_-_", " _ "]
#: minimum length-bucket width; the actual width is derived at runtime from
#: max(length(normalized filename)) so the +/-1-bucket adjacency stays
#: lossless for arbitrarily long names (see find_duplicate_pairs)
LEN_BUCKET_W = 32


def strip_extension(c):
    return F.regexp_replace(c, r"\.[^.]+$", "")


def normalize_filename_col(c):
    """duplicates.ts:158-171 — order matters, replicated exactly."""
    x = strip_extension(c)
    x = F.regexp_replace(x, r"^(\d{1,3}[\.\-\s_])+", "")
    x = F.regexp_replace(x, r"\(\d+\)$", "")
    x = F.regexp_replace(x, r"\[\d+\]$", "")
    x = F.regexp_replace(x, r"(?i)\b\d{3,4}k(bps)?\b", "")
    x = F.regexp_replace(x, r"\b(128|192|256|320)\b", "")
    x = F.regexp_replace(x, r"\[.*?\]", "")
    x = F.regexp_replace(x, r"\(.*?\)", "")
    return normalize_text(x)


def _parsed(base):
    """(artist, title) via first-found separator, split at first occurrence."""
    artist = F.lit(None).cast("string")
    title = F.lit(None).cast("string")
    for sep in reversed(SEPARATORS):
        pos = F.locate(sep, base)
        artist = F.when(pos > 0, F.trim(base.substr(F.lit(1), pos - 1))).otherwise(artist)
        title = F.when(
            pos > 0, F.trim(base.substr(pos + len(sep), F.length(base)))
        ).otherwise(title)
    return artist, title


def prepare(files: DataFrame) -> DataFrame:
    """Derive the normalized/parsed comparison columns (once, up front)."""
    base = strip_extension(F.col("filename"))
    pa_, pt = _parsed(base)
    truthy = lambda c: c.isNotNull() & (c != F.lit(""))  # noqa: E731
    return files.select(
        "*",
        normalize_text("artist").alias("_na"),
        normalize_text("title").alias("_nt"),
        normalize_text("album").alias("_nal"),
        normalize_filename_col(F.col("filename")).alias("_nf"),
        F.when(truthy(pa_), pa_).alias("_pa"),
        F.when(truthy(pt), pt).alias("_pt"),
        (
            truthy(F.col("title")).cast("int")
            + truthy(F.col("artist")).cast("int")
            + truthy(F.col("album")).cast("int")
            + (F.coalesce(F.col("year"), F.lit(0)) != 0).cast("int")
            + (F.coalesce(F.col("trackNumber"), F.lit(0)) != 0).cast("int")
            + truthy(F.col("genre")).cast("int")
        ).alias("_tag_count"),
        (
            F.when(F.col("lossless"), F.lit(1000.0)).otherwise(0.0)
            + F.coalesce(F.col("bitrate"), F.lit(0)).cast("double")
            + F.coalesce(F.col("sampleRate"), F.lit(0)).cast("double") / 100.0
            + F.coalesce(F.col("bitDepth"), F.lit(0)).cast("double") * 10.0
        ).alias("_quality"),
    )


def _cand(df_a: DataFrame, df_b: DataFrame, cond) -> DataFrame:
    return (
        df_a.join(df_b, cond & (F.col("a.path") < F.col("b.path")))
        .select(F.col("a.path").alias("path_a"), F.col("b.path").alias("path_b"))
    )


def find_duplicates_compat(
    files: DataFrame, duration_tolerance_seconds: float = 5.0
) -> DataFrame:
    """AudioFileMetadata table -> duplicate pairs with reference semantics.

    Output: path_a, path_b, is_match, confidence, match_reasons,
    suggested_keep (exactly compareFiles + selectBestFile).
    """
    p = prepare(files).persist()
    a, b = p.alias("a"), p.alias("b")
    nn = lambda side, c: F.col(f"{side}.{c}").isNotNull() & (F.col(f"{side}.{c}") != "")  # noqa: E731

    c1 = _cand(
        a,
        b,
        nn("a", "artist") & nn("b", "artist") & nn("a", "title") & nn("b", "title")
        & (F.col("a._na") == F.col("b._na")) & (F.col("a._nt") == F.col("b._nt")),
    )
    c2 = _cand(
        a,
        b,
        F.col("a._pa").isNotNull() & F.col("b._pa").isNotNull()
        & F.col("a._pt").isNotNull() & F.col("b._pt").isNotNull()
        & (normalize_text(F.col("a._pa")) == normalize_text(F.col("b._pa")))
        & (normalize_text(F.col("a._pt")) == normalize_text(F.col("b._pt"))),
    )
    c3 = _cand(a, b, F.col("a._nf") == F.col("b._nf"))
    # length-bucket blocking for the Levenshtein arm. Bucket width is derived
    # from the data at runtime: the d in {-1,0,1} adjacency is lossless only
    # while 0.1 * max_len <= W, so W grows with the longest normalized name
    # (one tiny max() aggregate — the compat corpus is the reference's own
    # driver-scale workload)
    max_len = p.agg(F.max(F.length("_nf"))).collect()[0][0] or 0
    bucket_w = max(LEN_BUCKET_W, -(-int(max_len) // 10))  # ceil(max_len/10)
    ab = p.withColumn("_bkt", F.floor(F.length("_nf") / bucket_w))
    la, lb = ab.alias("a"), ab.alias("b")
    c4_parts = []
    for d in (-1, 0, 1):
        c4_parts.append(
            la.join(
                lb,
                (F.col("a._bkt") == F.col("b._bkt") + d)
                & (F.col("a.path") < F.col("b.path"))
                & (
                    F.abs(F.length("a._nf") - F.length("b._nf"))
                    <= F.greatest(F.length("a._nf"), F.length("b._nf")) * 0.1
                )
                & (F.greatest(F.length("a._nf"), F.length("b._nf")) > 0)
                & (
                    F.levenshtein("a._nf", "b._nf")
                    / F.greatest(F.length("a._nf"), F.length("b._nf"))
                    <= 0.1
                ),
            ).select(F.col("a.path").alias("path_a"), F.col("b.path").alias("path_b"))
        )
    cand = c1.unionByName(c2).unionByName(c3)
    for c in c4_parts:
        cand = cand.unionByName(c)
    cand = cand.distinct()

    # hydrate + compareFiles scoring
    fa = p.select(*[F.col(c).alias(f"a_{c}") for c in p.columns])
    fb = p.select(*[F.col(c).alias(f"b_{c}") for c in p.columns])
    h = cand.join(fa, cand.path_a == fa.a_path).join(fb, cand.path_b == fb.b_path)

    nn2 = lambda s, c: F.col(f"{s}_{c}").isNotNull() & (F.col(f"{s}_{c}") != "")  # noqa: E731
    m_at = (
        nn2("a", "artist") & nn2("b", "artist") & nn2("a", "title") & nn2("b", "title")
        & (F.col("a__na") == F.col("b__na")) & (F.col("a__nt") == F.col("b__nt"))
    )
    m_parsed = (
        F.col("a__pa").isNotNull() & F.col("b__pa").isNotNull()
        & F.col("a__pt").isNotNull() & F.col("b__pt").isNotNull()
        & (normalize_text(F.col("a__pa")) == normalize_text(F.col("b__pa")))
        & (normalize_text(F.col("a__pt")) == normalize_text(F.col("b__pt")))
    )
    m_fneq = F.col("a__nf") == F.col("b__nf")
    maxlen = F.greatest(F.length("a__nf"), F.length("b__nf"))
    m_flev = (maxlen > 0) & (
        (F.lit(1.0) - F.levenshtein("a__nf", "b__nf") / maxlen) >= 0.9
    )
    m_fn = m_parsed | m_fneq | m_flev
    m_dur = (
        F.col("a_duration").isNotNull()
        & F.col("b_duration").isNotNull()
        & (F.abs(F.col("a_duration") - F.col("b_duration")) <= duration_tolerance_seconds)
    )
    m_alb = (
        nn2("a", "album") & nn2("b", "album") & (F.col("a__nal") == F.col("b__nal"))
    )

    a_score = F.col("a__tag_count") * 1000 + F.col("a__quality")
    b_score = F.col("b__tag_count") * 1000 + F.col("b__quality")

    return h.select(
        "path_a",
        "path_b",
        (m_at | m_fn).alias("is_match"),
        (
            m_at.cast("int") * 50
            + m_fn.cast("int") * 30
            + m_dur.cast("int") * 15
            + m_alb.cast("int") * 5
        ).alias("confidence"),
        F.filter(
            F.array(
                F.when(m_at, F.lit("artist+title")),
                F.when(m_fn, F.lit("filename")),
                F.when(m_dur, F.lit("duration")),
                F.when(m_alb, F.lit("album")),
            ),
            lambda x: x.isNotNull(),
        ).alias("match_reasons"),
        # selectBestFile: strict > so ties keep the FIRST side
        # (duplicates.ts:198-225). The reference's "first" is Map-insertion
        # (directory-scan) order, which has no distributed equivalent; this
        # engine's deterministic stand-in is path order (path_a < path_b by
        # construction), so score-TIED pairs may keep a different member than
        # a reference run whose scan order differs from path order. Exact
        # parity holds whenever scores differ or scan order is path-sorted
        # (the parity test fixes scan order to path order for this reason).
        F.when(b_score > a_score, F.col("path_b")).otherwise(F.col("path_a")).alias(
            "suggested_keep"
        ),
    ).filter("is_match")
