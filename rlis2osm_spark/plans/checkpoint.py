"""Snapshot checkpoint / resume with per-partition lineage + row-count
metrics (north rule; descendant of the reference's LogSet telemetry,
dissolve.py:169-198 / SURVEY §2.5 A7).

Locally each stage materializes to parquet with a JSON manifest; on a real
cluster the same API maps 1:1 onto Iceberg: ``stage()`` becomes
``df.writeTo(tbl).createOrReplace()`` and a valid manifest becomes the latest
committed snapshot. Resume = skip stages whose manifest is valid — a rerun
of a 10-stage job that died at stage 7 replays nothing before it.

Metrics are collected with **one extra narrow aggregation** over
``spark_partition_id()`` (no second scan of the input: the stage output is
read back from its own snapshot), giving per-partition row counts — the
skew lineage the north rule asks for.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"


class Checkpointer:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "default"):
        self.spark = spark
        self.root = os.path.join(root, run_id)
        os.makedirs(self.root, exist_ok=True)
        self.lineage: list[dict] = []

    def _paths(self, name: str) -> tuple[str, str]:
        d = os.path.join(self.root, name)
        return d, os.path.join(d, _MANIFEST)

    def has_valid(self, name: str) -> bool:
        _, manifest = self._paths(name)
        if not os.path.exists(manifest):
            return False
        try:
            with open(manifest) as fh:
                meta = json.load(fh)
            return meta.get("status") == "committed"
        except (json.JSONDecodeError, OSError):
            return False

    def stage(
        self,
        name: str,
        build,
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Materialize ``build()`` as snapshot ``name`` (or read the existing
        valid snapshot). ``build`` is a thunk so skipped stages pay zero
        planning cost."""
        data_dir, manifest = self._paths(name)
        if self.has_valid(name) and not force:
            with open(manifest) as fh:
                self.lineage.append(json.load(fh) | {"resumed": True})
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)

        out = self.spark.read.parquet(data_dir)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        meta = {
            "stage": name,
            "status": "committed",
            "inputs": inputs or [],
            "row_count": int(sum(r["count"] for r in per_part)),
            "n_partitions": len(per_part),
            "partition_rows": {int(r["partition_id"]): int(r["count"])
                               for r in per_part},
            "max_partition_rows": max((int(r["count"]) for r in per_part),
                                      default=0),
            "wall_seconds": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(manifest, "w") as fh:
            json.dump(meta, fh, indent=1)
        self.lineage.append(meta | {"resumed": False})
        return out

    def invalidate(self, name: str) -> None:
        _, manifest = self._paths(name)
        if os.path.exists(manifest):
            os.remove(manifest)

    def report(self) -> list[dict]:
        return list(self.lineage)
