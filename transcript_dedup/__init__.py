"""transcript_dedup — PySpark-native near-duplicate detection + clustering
for multi-turn conversation/agent transcripts.

From-scratch Spark-first re-expression of the capabilities of
``adam-edison/audio-duplicate-finder`` (reference at /root/reference, see
SURVEY.md): scan → per-record feature extraction → candidate pairing →
verification/scoring → transitive clustering → rule-based keep/delete
decisions → conflict verification, with checkpoint/resume and lineage
metrics — redesigned for 10^12-turn scale on a multi-executor cluster.

Layout:
    config.py        job configuration (shingle/signature params, thresholds)
    session.py       SparkSession factory (AQE, Arrow, UTC, shuffle tuning)
    generate.py      deterministic transcript corpus generator (FIXTURES.md)
    normalize.py     text normalization chains (reference F1/F2 analogues)
    reconstruct.py   turns -> conversations (stable (conv_id, turn_idx) order)
    signatures.py    Arrow-batched MinHash/SimHash kernel (mapInPandas)
    detectors/       exact-hash, LSH banded join, SimHash verify, substring
    cluster.py       connected components (hash-to-min iterative join)
    decide.py        representative selection + decisions + conflict check
    io.py            TableIO seam (Iceberg-style snapshot semantics on parquet)
    metrics.py       pipeline_runs lineage/metrics table
    pipeline.py      end-to-end orchestration with resume
    oracle.py        slow exact Python oracle for parity tests (recall >= 0.99)
"""

__version__ = "0.1.0"
