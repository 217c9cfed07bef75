"""Stage checkpointing with per-partition lineage (north_rule resumability).

The reference's resumability is file-existence probing around torch caches
(`/root/reference/run_E2E_exhaustive.py:672-710`) plus skip-trained-steps on
restart (:156-168). This engine formalizes that as a stage protocol:

  * each stage writes its output table to ``{workdir}/{stage}/data`` (parquet
    here; format="iceberg" drops in unchanged when the runtime has the jars —
    gated by ``_HAS_ICEBERG``),
  * then appends per-partition counters to ``{workdir}/_lineage`` —
    (stage, partition_id, rows_out, wall_ms, ts),
  * then atomically writes a ``_STAGE_COMPLETE`` marker.

Resume = marker probe: a killed run recomputes only the stage it died in;
completed stages are read back, so reruns are identical (outputs are pure
functions of inputs — all ids are content hashes, no
monotonically_increasing_id anywhere).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HAS_ICEBERG = False  # iceberg-spark-runtime jar not in this image; parquet fallback
MARKER = "_STAGE_COMPLETE"


class StageRunner:
    """Runs named stages with checkpoint / resume / lineage.

    ``fingerprint`` guards resume against stale checkpoints: it is stored in
    each stage's ``_STAGE_COMPLETE`` marker, and a rerun whose fingerprint
    differs (e.g. a changed PipelineConfig knob) RECOMPUTES instead of
    silently returning the old stage output. None skips the check
    (fingerprint-less markers from older runs still resume under None).
    """

    def __init__(self, spark: SparkSession, workdir: str, fingerprint: str | None = None):
        self.spark = spark
        self.workdir = workdir
        self.fingerprint = fingerprint
        os.makedirs(workdir, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.workdir, stage)
        return os.path.join(d, "data"), os.path.join(d, MARKER)

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(self._paths(stage)[1])

    def run(self, stage: str, fn, force: bool = False) -> DataFrame:
        """Execute ``fn() -> DataFrame`` under the checkpoint protocol.

        On resume (marker present AND fingerprint match) the stored table is
        read back instead of recomputing — the downstream DAG then starts
        from a scan, which also truncates lineage like the reference's cache
        probe (`/root/reference/run_E2E_exhaustive.py:678-685`). A
        fingerprint mismatch means the checkpoint was produced under a
        different config: recompute rather than silently serve stale output.
        """
        data_path, marker = self._paths(stage)
        if self.is_complete(stage) and not force:
            if self.fingerprint is None:
                return self.spark.read.parquet(data_path)
            try:
                with open(marker) as f:
                    stored = json.load(f).get("fingerprint")
            except (OSError, json.JSONDecodeError):
                stored = None
            if stored == self.fingerprint:
                return self.spark.read.parquet(data_path)
            print(
                f"[lineage] stage {stage}: checkpoint fingerprint "
                f"{stored!r} != current {self.fingerprint!r} — recomputing"
            )
        t0 = time.monotonic()
        df = fn()
        df.write.mode("overwrite").parquet(data_path)
        # stage-internal caches (vocab/vectors in candidate_pairs, …) served
        # their purpose once the stage table is on disk — drop them so a
        # long-lived session (the driver runs dozens of queries in one) does
        # not accumulate executor-memory blocks
        self.spark.catalog.clearCache()
        wall_ms = int((time.monotonic() - t0) * 1000)
        out = self.spark.read.parquet(data_path)
        self._record_lineage(stage, out, wall_ms)
        with open(marker, "w") as f:
            json.dump(
                {"stage": stage, "wall_ms": wall_ms, "ts": time.time(),
                 "fingerprint": self.fingerprint},
                f,
            )
        return out

    def _record_lineage(self, stage: str, df: DataFrame, wall_ms: int) -> None:
        """Per-partition row counters from the just-written parquet FOOTERS —
        pyarrow metadata reads on the driver, zero Spark jobs (the previous
        groupBy(spark_partition_id) re-scanned every stage output: 6 extra
        jobs of pure serial floor per pipeline run)."""
        import glob as _glob

        import pyarrow.parquet as pq

        data_path = os.path.join(self.workdir, stage, "data")
        rows = []
        for pid, part in enumerate(sorted(_glob.glob(os.path.join(data_path, "part-*")))):
            try:
                n = pq.ParquetFile(part).metadata.num_rows
            except Exception:
                continue
            rows.append((stage, pid, n, wall_ms))
        if not rows:
            rows = [(stage, 0, 0, wall_ms)]
        lin = self.spark.createDataFrame(
            rows, "stage string, partition_id int, rows_out bigint, wall_ms long"
        ).select("*", F.current_timestamp().alias("ts"))
        lin.write.mode("append").parquet(os.path.join(self.workdir, "_lineage"))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "_lineage"))
