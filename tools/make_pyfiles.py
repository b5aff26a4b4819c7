"""Build the spark-submit --py-files artifact for the engine.

The north-rule deployment surface is

    spark-submit --py-files transcript_dedup.zip run_job.py ...

(or ``python -m transcript_dedup`` locally, see transcript_dedup/__main__.py).
This tool produces that zip deterministically from the package source:
only ``*.py`` files, no ``__pycache__``, fixed timestamps and sorted entry
order so the artifact hash is stable for a given source tree (useful for
cluster-side cache keys / provenance).

Usage:
    python tools/make_pyfiles.py [--out dist/transcript_dedup.zip]

Prints one JSON line: {"zip": path, "files": n, "sha256": hex}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "transcript_dedup"


def build_zip(out_path: str) -> dict:
    src_root = os.path.join(REPO, PACKAGE)
    entries = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            # _sigkernel.c rides along so the native signature kernel can
            # compile on executors (signatures._native_build reads it via
            # importlib.resources under zip import; absent gcc it falls
            # back to the numpy kernel)
            if fn.endswith(".py") or fn == "_sigkernel.c":
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                entries.append((arc, full))
    entries.sort()

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for arc, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            # fixed timestamp -> byte-stable zip for identical sources
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)

    with open(out_path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    return {"zip": out_path, "files": len(entries), "sha256": digest}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "transcript_dedup.zip"))
    a = ap.parse_args()
    print(json.dumps(build_zip(a.out)))


if __name__ == "__main__":
    main()
