"""Pure-Python oracle for the audio compatibility mode — an exact
reimplementation of the reference's comparator semantics
(/root/reference/src/duplicates.ts:44-225) used by the parity test, JS
truthiness quirks included. All-pairs, driver-only: test scale only.
"""

from __future__ import annotations

import re


def normalize_string(s: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", s.lower(), flags=re.ASCII), flags=re.ASCII).strip()


def normalize_filename(filename: str) -> str:
    x = re.sub(r"\.[^.]+$", "", filename)
    x = re.sub(r"^(\d{1,3}[\.\-\s_])+", "", x)
    x = re.sub(r"\(\d+\)$", "", x)
    x = re.sub(r"\[\d+\]$", "", x)
    x = re.sub(r"\b\d{3,4}k(bps)?\b", "", x, flags=re.IGNORECASE)
    x = re.sub(r"\b(128|192|256|320)\b", "", x)
    x = re.sub(r"\[.*?\]", "", x)
    x = re.sub(r"\(.*?\)", "", x)
    return normalize_string(x)


SEPARATORS = [" - ", " – ", " — ", "_-_", " _ "]


def parse_filename_for_comparison(filename: str) -> tuple[str | None, str | None]:
    base = re.sub(r"\.[^.]+$", "", filename)
    for sep in SEPARATORS:
        i = base.find(sep)
        if i == -1:
            continue
        return base[:i].strip(), base[i + len(sep):].strip()
    return None, None


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def check_artist_title(fa: dict, fb: dict) -> bool:
    if not fa.get("artist") or not fb.get("artist") or not fa.get("title") or not fb.get("title"):
        return False
    return (
        normalize_string(fa["artist"]) == normalize_string(fb["artist"])
        and normalize_string(fa["title"]) == normalize_string(fb["title"])
    )


def check_filename(fa: dict, fb: dict) -> bool:
    pa, pta = parse_filename_for_comparison(fa["filename"])
    pb, ptb = parse_filename_for_comparison(fb["filename"])
    if pa and pb and pta and ptb:
        if normalize_string(pa) == normalize_string(pb) and normalize_string(pta) == normalize_string(ptb):
            return True
    na, nb = normalize_filename(fa["filename"]), normalize_filename(fb["filename"])
    if na == nb:
        return True
    max_len = max(len(na), len(nb))
    if max_len == 0:
        return False
    return 1 - levenshtein(na, nb) / max_len >= 0.9


def count_filled_tags(f: dict) -> int:
    return sum(
        bool(f.get(k)) for k in ("title", "artist", "album", "year", "trackNumber", "genre")
    )


def quality_score(f: dict) -> float:
    s = 0.0
    if f.get("lossless"):
        s += 1000
    if f.get("bitrate"):
        s += f["bitrate"]
    if f.get("sampleRate"):
        s += f["sampleRate"] / 100
    if f.get("bitDepth"):
        s += f["bitDepth"] * 10
    return s


def compare_files(fa: dict, fb: dict, tol: float = 5.0):
    at = check_artist_title(fa, fb)
    fn = check_filename(fa, fb)
    if not at and not fn:
        return None
    conf, reasons = 0, []
    if at:
        conf += 50
        reasons.append("artist+title")
    if fn:
        conf += 30
        reasons.append("filename")
    da, db = fa.get("duration"), fb.get("duration")
    if da is not None and db is not None and abs(da - db) <= tol:
        conf += 15
        reasons.append("duration")
    if fa.get("album") and fb.get("album") and normalize_string(fa["album"]) == normalize_string(fb["album"]):
        conf += 5
        reasons.append("album")
    return conf, reasons


def select_best(paths: list[str], by_path: dict) -> str | None:
    best, best_score = None, -1.0
    for p in paths:
        f = by_path.get(p)
        if f is None:
            continue
        s = count_filled_tags(f) * 1000 + quality_score(f)
        if s <= best_score:
            continue
        best_score, best = s, p
    return best


def find_duplicates(files: list[dict], tol: float = 5.0):
    """-> dict[(path_a, path_b)] = (confidence, reasons, suggested_keep)."""
    by_path = {f["path"]: f for f in files}
    out = {}
    for i in range(len(files)):
        for j in range(i + 1, len(files)):
            r = compare_files(files[i], files[j], tol)
            if r is None:
                continue
            pa, pb = files[i]["path"], files[j]["path"]
            keep = select_best([pa, pb], by_path)
            key = (pa, pb) if pa < pb else (pb, pa)
            out[key] = (r[0], r[1], keep)
    return out
