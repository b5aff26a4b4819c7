"""pipeline_runs lineage + metrics table.

Analogue of the reference's scan-state checkpoint files
(/root/reference/src/index.ts:99-110, :221-223) scaled out: one row per
completed stage with snapshot id, input/output row counts, wall time, and
per-partition output row counts (skew visibility). Written through TableIO
so the metrics table itself is snapshot-committed.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import TableIO


def partition_counts(df: DataFrame) -> list[int]:
    """Output rows per partition (spark_partition_id rollup)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [int(r["count"]) for r in rows]


class MetricsLog:
    def __init__(self, io: TableIO, run_id: str):
        self.io = io
        self.run_id = run_id
        self.rows: list[dict] = []

    def log_stage(
        self,
        stage: str,
        snapshot_id: int | None,
        rows_in: int,
        rows_out: int,
        wall_ms: float,
        counters: dict | None = None,
        partitions: list[int] | None = None,
    ) -> None:
        self.rows.append(
            {
                "run_id": self.run_id,
                "stage": stage,
                "snapshot_id": snapshot_id,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_ms": float(wall_ms),
                "counters": {k: int(v) for k, v in (counters or {}).items()},
                "partition_rows": partitions or [],
            }
        )

    def flush(self, spark: SparkSession) -> None:
        if not self.rows:
            return
        schema = (
            "run_id string, stage string, snapshot_id long, rows_in long, "
            "rows_out long, wall_ms double, counters map<string,long>, "
            "partition_rows array<long>"
        )
        df = spark.createDataFrame(
            [
                (
                    r["run_id"],
                    r["stage"],
                    r["snapshot_id"],
                    r["rows_in"],
                    r["rows_out"],
                    r["wall_ms"],
                    r["counters"],
                    r["partition_rows"],
                )
                for r in self.rows
            ],
            schema=schema,
        )
        self.io.write(df, "pipeline_runs", mode="append")


class StageTimer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def ms(self) -> float:
        return (time.perf_counter() - self.t0) * 1000.0
