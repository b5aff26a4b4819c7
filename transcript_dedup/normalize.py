"""Text normalization chains.

F1 ``normalizeString`` (/root/reference/src/duplicates.ts:150-156):
lower -> strip non-word chars -> collapse whitespace -> trim. This exact
chain is the graft's canonical text normalizer; per-turn text equality vs the
reference oracle is defined over it.

Both a Spark Column expression and a pure-Python twin are provided; the twin
is used by the oracle (tests) so both sides share one definition. NOTE on
regex dialects: the reference's JS ``/[^\\w\\s]/g`` (no ``u`` flag) and Spark's
Java regex both treat ``\\w`` as ASCII ``[A-Za-z0-9_]``; Python's ``re``
defaults to Unicode, so the twin pins ``re.ASCII`` to match. DuckDB (RE2) is
ASCII for ``\\w`` as well, so oracle SQL uses the same pattern unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_NON_WORD = re.compile(r"[^\w\s]", re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)


def normalize_text(col: Column | str) -> Column:
    """F1 chain as a Spark expression (whole-stage-codegen, no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", ""), r"\s+", " "))


def normalize_text_py(s: str) -> str:
    """Pure-Python twin of :func:`normalize_text` (oracle side)."""
    return _WS.sub(" ", _NON_WORD.sub("", s.lower())).strip()


NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower({col}), '[^\\w\\s]', '', 'g'), "
    "'\\s+', ' ', 'g'))"
)
"""DuckDB-dialect equivalent (RE2 needs the 'g' flag for replace-all)."""


def tokens_py(normalized: str) -> list[str]:
    """Token stream over normalized text (split on single spaces)."""
    return normalized.split(" ") if normalized else []


def shingles_py(normalized: str, k: int) -> set[str]:
    """k-token shingle set; documents shorter than k tokens yield the whole
    token string as a single shingle (so short docs still have a signature)."""
    toks = tokens_py(normalized)
    if not toks or toks == [""]:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
