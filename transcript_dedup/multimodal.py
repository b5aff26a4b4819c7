"""Multimodal attachment columns: opaque binary + typed metadata.

Training-data pipelines carry image/audio/video alongside text. The engine
treats media as ``binary`` columns with a typed metadata map; decode /
feature-extract runs as Arrow-batched ``mapInPandas`` kernels.

Real decode is implemented for the container formats that parse with pure
``struct``/numpy — PCM WAV audio (RIFF) and binary PPM/PGM images — and
produces signal-level features (amplitude envelope / luminance histogram).
Genuinely COMPRESSED formats (JPEG/PNG/MP3/H.264 ...) need codec libraries
(PIL / soundfile / pyav) that this environment does not ship, so those
payloads raise ``NotImplementedError`` inside the decoder; the extraction
kernel converts that to ``decode_ok = false`` per row. A deterministic fake
decoder (byte-histogram embedding) remains for plumbing tests.

Attachment schema:
    (conv_id string, turn_idx int, kind string,       -- image|audio|video
     content binary, meta map<string,string>)
Feature schema adds:
    (feat array<float>, feat_dim int, decode_ok boolean)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEAT_DIM = 64

try:  # full codec coverage if ever present — not shipped in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # noqa: BLE001
    _HAVE_PIL = False


# --------------------------------------------------------------------------
# container parsers — pure struct/numpy, no codec libraries
# --------------------------------------------------------------------------

def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (mono float64 samples in [-1, 1], sample_rate).

    Parses the chunk list (fmt /data, skipping LIST/INFO etc.); supports
    uncompressed PCM at 8/16/32 bits, any channel count (downmixed by
    mean). Compressed codecs (format tag != 1) raise NotImplementedError.
    """
    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        csz = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels = struct.unpack_from("<HH", fmt, 0)
    sample_rate = struct.unpack_from("<I", fmt, 4)[0]
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format tag {audio_format} is compressed; only PCM decodes "
            "without codec libraries"
        )
    if bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(data[: len(data) // 2 * 2], "<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = (
            np.frombuffer(data[: len(data) // 4 * 4], "<i4").astype(np.float64)
            / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if n_channels > 1:
        x = x[: len(x) // n_channels * n_channels].reshape(-1, n_channels).mean(axis=1)
    return x, int(sample_rate)


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) -> uint8 array (H, W[, 3]).

    Pure header-token parser (handles '#' comments); maxval must fit a
    byte. This is the classic codec-free interchange format.
    """
    if content[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    is_rgb = content[:2] == b"P6"
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(content):
            raise ValueError("truncated PPM/PGM header")
        c = content[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(content[start:pos]))
    # exactly ONE whitespace byte separates maxval from the raster (PNM
    # spec); a CRLF or comment here would silently shift the raster offset,
    # so validate the separator and the remaining byte count instead of
    # trusting frombuffer's count check alone
    if pos >= len(content) or not content[pos : pos + 1].isspace():
        raise ValueError("PPM/PGM: missing whitespace after maxval")
    pos += 1
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM/PGM not supported")
    n = w * h * (3 if is_rgb else 1)
    # reject truncation only; tolerate trailing bytes (padded / concatenated
    # containers) — the same policy decode_wav applies to RIFF payloads, so
    # the two decoders agree on tolerance
    if len(content) - pos < n:
        raise ValueError(
            f"PPM/PGM: raster is {len(content) - pos} bytes, expected {n} "
            f"for {w}x{h}x{3 if is_rgb else 1}"
        )
    raster = np.frombuffer(content, np.uint8, count=n, offset=pos)
    return raster.reshape((h, w, 3) if is_rgb else (h, w))


def _audio_features(samples: np.ndarray) -> np.ndarray:
    """FEAT_DIM-bucket mean-absolute-amplitude envelope, L2-normalized —
    a signal-level fingerprint stable under container re-wrapping."""
    if samples.size == 0:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    idx = np.arange(samples.size) * FEAT_DIM // samples.size
    env = np.zeros(FEAT_DIM)
    np.add.at(env, idx, np.abs(samples))
    cnt = np.bincount(idx, minlength=FEAT_DIM).astype(np.float64)
    env = env / np.maximum(cnt, 1)
    n = np.linalg.norm(env)
    return (env / n if n else env).astype(np.float32)


def _image_features(pix: np.ndarray) -> np.ndarray:
    """FEAT_DIM-bin luminance histogram, L2-normalized.

    Luminance is explicit elementwise IEEE arithmetic (not ``pix @ vec``):
    BLAS dot products may fuse multiply-add, which would make the value
    bit-unreproducible in plain SQL — the DuckDB oracle for
    doc_multimodal_features recomputes exactly ``0.299*r + 0.587*g +
    0.114*b`` left-to-right in doubles."""
    if pix.ndim == 3:
        p = pix.astype(np.float64)
        lum = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    else:
        lum = pix
    hist = np.bincount(
        np.clip(lum.astype(np.int64) >> 2, 0, FEAT_DIM - 1).ravel(),
        minlength=FEAT_DIM,
    )[:FEAT_DIM].astype(np.float64)
    n = np.linalg.norm(hist)
    return (hist / n if n else hist).astype(np.float32)


def decode_media(kind: str, content: bytes, mode: str = "fake") -> np.ndarray:
    """-> FEAT_DIM float32 feature vector.

    mode='real' parses the payload by magic bytes: PCM WAV -> amplitude
    envelope; binary PPM/PGM -> luminance histogram. Compressed formats
    (JPEG/PNG/MP3/...) raise NotImplementedError — they need codec
    libraries (PIL / soundfile / pyav) this environment does not ship; the
    extraction kernel maps that to decode_ok=false per row.
    mode='fake' is a deterministic byte-statistics embedding: a 64-bin byte
    histogram, L2-normalized — stable across runs and processes, so tests
    can assert exact values and near-dup detection on perturbed payloads
    behaves like a real embedding would.
    """
    if mode == "real":
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            return _audio_features(decode_wav(content)[0])
        if content[:2] in (b"P6", b"P5"):
            return _image_features(decode_ppm(content))
        raise NotImplementedError(
            "real decode covers codec-free containers only (PCM WAV, binary "
            "PPM/PGM); this payload needs a codec library (PIL/soundfile/"
            "pyav) absent in this sandbox"
        )
    x = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(x >> 2, minlength=FEAT_DIM)[:FEAT_DIM].astype(np.float64)
    n = np.linalg.norm(hist)
    return (hist / n if n else hist).astype(np.float32)


def build_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float samples in [-1, 1] -> minimal 16-bit PCM mono WAV bytes
    (deterministic; used by tests and corpus generators)."""
    pcm = (np.clip(samples, -1, 1) * 32767.0).astype("<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def build_ppm(pix: np.ndarray) -> bytes:
    """uint8 (H, W, 3) -> binary P6 PPM bytes (deterministic)."""
    h, w = pix.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + pix.astype(np.uint8).tobytes()


def extract_features(attachments: DataFrame, mode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction; all input columns pass through."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        FloatType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        attachments.schema.fields
        + [
            StructField("feat", ArrayType(FloatType()), True),
            StructField("feat_dim", IntegerType(), False),
            StructField("decode_ok", BooleanType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for kind, content in zip(pdf["kind"], pdf["content"]):
                try:
                    feats.append(decode_media(kind, bytes(content), mode).tolist())
                    oks.append(True)
                except (NotImplementedError, ValueError):
                    feats.append(None)
                    oks.append(False)
            pdf = pdf.copy()
            pdf["feat"] = feats
            pdf["feat_dim"] = pd.array([FEAT_DIM] * len(pdf), dtype="int32")
            pdf["decode_ok"] = pd.array(oks, dtype="bool")
            yield pdf

    return attachments.mapInPandas(kernel, schema=out_schema)


#: kinds cycled by synth_payload_signal — index = doc_id % 3
MM_KINDS = ("audio", "image", "video")


def synth_payload_signal(doc_id: int) -> tuple[str, np.ndarray]:
    """Deterministic pre-encode signal for a document id: the single source
    of truth shared by the Spark query (doc_multimodal_features encodes it
    to a real WAV/PPM container and round-trips it through the decoders)
    and the driver's DuckDB oracle export (which writes these raw arrays to
    parquet so the SQL side can recompute the features independently).

    audio -> float64 samples in [-1, 1); image -> uint8 (H, W, 3) pixels;
    video -> opaque bytes that no codec-free decoder can handle
    (exercises the decode_ok=false path).
    """
    kind = MM_KINDS[doc_id % 3]
    rng = np.random.default_rng(doc_id)
    if kind == "audio":
        n = 256 + (doc_id % 7) * 64
        return kind, rng.uniform(-1.0, 1.0, n)
    if kind == "image":
        h, w = 6 + doc_id % 4, 8 + doc_id % 5
        return kind, rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return kind, rng.integers(0, 256, 64, dtype=np.uint8)


def synth_payload(doc_id: int) -> tuple[str, bytes]:
    """synth_payload_signal encoded into a real container: 16-bit PCM WAV
    for audio, binary P6 PPM for image; video gets an MPEG-PS-style magic
    prefix so decode_media('real') raises NotImplementedError exactly like
    a genuinely compressed payload would."""
    kind, sig = synth_payload_signal(doc_id)
    if kind == "audio":
        return kind, build_wav(sig, sample_rate=8000)
    if kind == "image":
        return kind, build_ppm(sig)
    return kind, b"\x00\x00\x01\xba" + sig.tobytes()


def synth_attachments(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic media payload to every id — Arrow-batched
    mapInPandas (binary blob construction is inherently per-payload, same
    shape as the extraction kernel); all input columns pass through."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    out_schema = StructType(
        docs.schema.fields
        + [
            StructField("kind", StringType(), False),
            StructField("content", BinaryType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, blobs = [], []
            for i in pdf[id_col]:
                k, b = synth_payload(int(i))
                kinds.append(k)
                blobs.append(b)
            pdf = pdf.copy()
            pdf["kind"] = kinds
            pdf["content"] = blobs
            yield pdf

    return docs.mapInPandas(kernel, schema=out_schema)


def generate_attachments(spark, n: int = 100, seed: int = 42, dup_frac: float = 0.2):
    """Deterministic fake attachment corpus with planted near-duplicate
    payloads (a few flipped bytes — analogous to re-encoded media)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    n_base = int(n * (1 - dup_frac))
    blobs = []
    for i in range(n_base):
        size = int(rng.integers(512, 4096))
        content = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        blobs.append(content)
        rows.append(
            (f"c{i:06d}", 0, kinds[i % 3], bytearray(content), {"src": f"gen{i % 5}"})
        )
    for j in range(n - n_base):
        base = int(rng.integers(0, n_base))
        buf = bytearray(blobs[base])
        for _ in range(int(rng.integers(1, 8))):  # tiny perturbation
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        rows.append(
            (f"d{j:06d}", 0, kinds[base % 3], buf, {"src": "dup", "of": f"c{base:06d}"})
        )
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, kind string, content binary, meta map<string,string>",
    )


def attachment_near_dup_pairs(attachments: DataFrame, threshold: float = 0.999) -> DataFrame:
    """Feature-cosine near-dup pairs over decoded attachments — reuses the
    embedding LSH machinery (candidate buckets + exact verify)."""
    from .embeddings import embedding_near_dup_pairs

    feats = extract_features(attachments).filter("decode_ok").select(
        "conv_id", "feat"
    )
    return embedding_near_dup_pairs(
        feats, threshold=threshold, id_col="conv_id", vec_col="feat"
    ).withColumnRenamed("id_a", "conv_a").withColumnRenamed("id_b", "conv_b")
