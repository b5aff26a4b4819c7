"""MinHash + SimHash signature kernel (Arrow-batched, numpy-vectorized).

This is the engine's ONLY Python compute (SURVEY.md section 1.4 invariant:
no per-row Python — the kernel runs inside ``mapInPandas`` over Arrow record
batches). The same numpy functions are imported by the pure-Python oracle
(oracle.py) so signatures are bit-identical on both sides — that is what the
north rule's "identical shingle/signature config" means operationally.

Graft analogue: the reference's per-record black-box extraction
(``music-metadata.parseFile``, /root/reference/src/metadata.ts:11-13) becomes
normalize -> k-shingle -> MinHash/SimHash per conversation.

Hashing scheme (all deterministic, seedable, no wall clock):
  shingle -> uint64 via blake2b(digest_size=8)  (stable across processes,
             unlike Python's salted hash())
  MinHash: num_perm universal-ish permutations h_i(x) = a_i*x + b_i mod 2^64
           (multiply-add with natural uint64 wraparound), sig_i = min over
           the doc's shingle hashes.
  SimHash: 64-bit, token unigrams weighted by count; bit votes summed
           vectorized, sign -> bit.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd

from .config import DedupConfig
from .normalize import tokens_py

_U64 = np.uint64


def minhash_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) arrays of shape (num_perm,), odd multipliers, seeded."""
    rng = np.random.default_rng(cfg.minhash_seed)
    a = rng.integers(1, 2**63, size=cfg.num_perm, dtype=np.uint64) * _U64(2) + _U64(1)
    b = rng.integers(0, 2**63, size=cfg.num_perm, dtype=np.uint64)
    return a, b


def hash_strings_u64(strings: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of UTF-8 strings (blake2b/8)."""
    if not strings:
        return np.empty(0, dtype=np.uint64)
    return np.frombuffer(
        b"".join(blake2b(s.encode("utf-8"), digest_size=8).digest() for s in strings),
        dtype="<u8",
    ).copy()


def shingle_hashes(norm_text: str, k: int) -> np.ndarray:
    """Hashes of the k-token shingle *set* of a normalized document.

    Docs with fewer than k tokens yield one shingle (the whole token string);
    empty docs yield none.
    """
    toks = tokens_py(norm_text)
    if not toks or toks == [""]:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < k:
        shings = {" ".join(toks)}
    else:
        shings = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return hash_strings_u64(sorted(shings))


_EMPTY_SIG_FILL = _U64(0xFFFFFFFFFFFFFFFF)


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """sig_i = min_j (a_i * sh_j + b_i) mod 2^64; empty doc -> all-ones fill
    (never collides with a real signature under distinct band values)."""
    if sh.size == 0:
        return np.full(a.shape[0], _EMPTY_SIG_FILL, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * sh[None, :] + b[:, None]
    return vals.min(axis=1)


def simhash64(norm_text: str) -> np.uint64:
    """Weighted 64-bit SimHash over token unigrams."""
    toks = tokens_py(norm_text)
    if not toks or toks == [""]:
        return _U64(0)
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    h = hash_strings_u64(list(uniq))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(
        np.int64
    )
    votes = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    packed = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
    return np.frombuffer(packed.tobytes(), dtype="<u8")[0]


def sampled_gram_hashes(norm_text: str, k: int, mod: int) -> np.ndarray:
    """Content-defined sampled k-char-gram hashes (substring detector blocking).

    Rolling polynomial hash over the UTF-8 bytes of the normalized text; a
    gram is *sampled* iff ``hash % mod == 0``. Selection is content-defined
    (position-independent), so if doc A is a contiguous substring of doc B,
    every sampled gram of A is also a sampled gram of B — the containment
    candidate guarantee. Returns the unique sampled hashes (uint64).
    """
    data = norm_text.encode("utf-8")
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    x = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    p = _U64(1099511628211)  # FNV-ish odd base, wraparound mod 2^64
    powers = np.empty(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers[k - 1] = _U64(1)
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * p
        w = np.lib.stride_tricks.sliding_window_view(x, k)
        h = (w * powers[None, :]).sum(axis=1, dtype=np.uint64)
    sel = h[h % _U64(mod) == _U64(0)]
    return np.unique(sel)


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Estimated Jaccard = fraction of agreeing signature positions.
    Deterministic given identical signatures — the Spark verify stage computes
    exactly this with zip_with/aggregate."""
    return float((sig_a == sig_b).mean())


def band_tuples(sig: np.ndarray, bands: int, rows: int) -> list[tuple]:
    """The (band_id, row-values...) keys used for LSH collision — the oracle
    compares raw tuples where Spark hash-joins on xxhash64(slice); Spark's
    candidate set is therefore a superset (hash collisions only add pairs)."""
    return [(b, *sig[b * rows : (b + 1) * rows].tolist()) for b in range(bands)]


def compute_signature_row(norm_text: str, cfg: DedupConfig, a: np.ndarray, b: np.ndarray):
    """(minhash int64 list, simhash int64, n_shingles int) for one doc."""
    sh = shingle_hashes(norm_text, cfg.shingle_k)
    sig = minhash_signature(sh, a, b)
    sim = int(simhash64(norm_text))
    if sim >= 1 << 63:  # two's-complement into Spark LongType
        sim -= 1 << 64
    grams = sampled_gram_hashes(norm_text, cfg.substring_gram_k, cfg.substring_mod)
    return sig.view(np.int64).tolist(), sim, int(sh.size), grams.view(np.int64).tolist()


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------

def add_signatures(conv_df, cfg: DedupConfig):
    """conversations(+norm_text) -> + minhash array<bigint>, simhash bigint,
    n_shingles int. Arrow-batched mapInPandas; all other columns pass through.
    """
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        conv_df.schema.fields
        + [
            StructField("minhash", ArrayType(LongType(), False), False),
            StructField("simhash", LongType(), False),
            StructField("n_shingles", IntegerType(), False),
            StructField("sub_grams", ArrayType(LongType(), False), False),
        ]
    )
    k = cfg  # closure capture of the frozen dataclass (tiny, pickle-safe)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a, b = minhash_params(k)
        for pdf in batches:
            sigs, sims, counts, grams = [], [], [], []
            for t in pdf["norm_text"].astype(str):
                sg, sm, ns, gr = compute_signature_row(t, k, a, b)
                sigs.append(sg)
                sims.append(sm)
                counts.append(ns)
                grams.append(gr)
            pdf = pdf.copy()
            pdf["minhash"] = sigs
            pdf["simhash"] = pd.array(sims, dtype="int64")
            pdf["n_shingles"] = pd.array(counts, dtype="int32")
            pdf["sub_grams"] = grams
            yield pdf

    return conv_df.mapInPandas(kernel, schema=out_schema)
