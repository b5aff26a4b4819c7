"""Multimodal attachment columns: opaque binary + typed metadata.

Training-data pipelines carry image/audio/video alongside text. The engine
treats media as ``binary`` columns with a typed metadata map; decode /
feature-extract runs as Arrow-batched ``mapInPandas`` kernels. The
image/audio codec libraries are NOT present in this environment, so the
decode step is STUBBED: ``decode_media`` raises ``NotImplementedError``
unless a deterministic fake decoder is selected — but the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is real
and tested, and the fake decoder is deterministic so downstream dedup
(feature near-dup via embeddings.py) is testable end-to-end.

Attachment schema:
    (conv_id string, turn_idx int, kind string,       -- image|audio|video
     content binary, meta map<string,string>)
Feature schema adds:
    (feat array<float>, feat_dim int, decode_ok boolean)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEAT_DIM = 64

try:  # real decoders, absent in this container — stub-gated
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # noqa: BLE001
    _HAVE_PIL = False


def decode_media(kind: str, content: bytes, mode: str = "fake") -> np.ndarray:
    """-> FEAT_DIM float32 feature vector.

    mode='real' requires codec libraries (PIL / soundfile / pyav) that this
    environment does not ship -> NotImplementedError, by design.
    mode='fake' is a deterministic byte-statistics embedding: a 64-bin byte
    histogram, L2-normalized — stable across runs and processes, so tests
    can assert exact values and near-dup detection on perturbed payloads
    behaves like a real embedding would.
    """
    if mode == "real":
        raise NotImplementedError(
            "real media decode needs PIL/soundfile/pyav; not available in this "
            "sandbox — use mode='fake' (deterministic) for pipeline testing"
        )
    x = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(x >> 2, minlength=FEAT_DIM)[:FEAT_DIM].astype(np.float64)
    n = np.linalg.norm(hist)
    return (hist / n if n else hist).astype(np.float32)


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
