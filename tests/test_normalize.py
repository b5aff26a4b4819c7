"""F1 normalizer: Spark expression == Python twin == DuckDB SQL on the same
inputs (the three dialects used across pipeline / oracle / driver checks)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from transcript_dedup.normalize import NORMALIZE_SQL, normalize_text, normalize_text_py

CASES = [
    "Hello, World!",
    "  MANY   spaces\tand\ttabs  ",
    "punct!@#$%^&*()_+ stays_underscore",
    "Mixed CASE and numbers 123-456",
    "apostrophe's and \"quotes\"",
    "",
    "\n\nnewlines\nbecome\nspaces\n",
    "unicode café naïve über stripped (ascii \\w semantics)",
    "trailing punctuation...",
]


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": CASES}))
    got = [r["n"] for r in df.select(normalize_text("s").alias("n")).collect()]
    want = [normalize_text_py(s) for s in CASES]
    assert got == want


def test_duckdb_matches_python_twin():
    con = duckdb.connect()
    expr = NORMALIZE_SQL.format(col="s")
    got = [
        con.execute(f"select {expr} from (select ? as s)", [s]).fetchone()[0]
        for s in CASES
    ]
    want = [normalize_text_py(s) for s in CASES]
    assert got == want


def test_idempotent():
    for s in CASES:
        n = normalize_text_py(s)
        assert normalize_text_py(n) == n
