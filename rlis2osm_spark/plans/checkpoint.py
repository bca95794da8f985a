"""Snapshot checkpoint / resume with per-partition lineage + row-count
metrics (north rule; descendant of the reference's LogSet telemetry,
dissolve.py:169-198 / SURVEY §2.5 A7).

Locally each stage materializes to parquet with a JSON manifest; on a real
cluster the same API maps 1:1 onto Iceberg: ``stage()`` becomes
``df.writeTo(tbl).createOrReplace()`` and a valid manifest becomes the latest
committed snapshot. Resume = skip stages whose manifest is valid — a rerun
of a 10-stage job that died at stage 7 replays nothing before it.

Two r2 upgrades (ADVICE/VERDICT r1):

- **Input fingerprinting**: a manifest is only valid if its recorded input
  fingerprint still matches — upstream stage manifests by digest, external
  paths by (file, size, mtime) — so a rerun after upstream data changed
  rebuilds instead of silently serving the stale snapshot.
- **Write-layout metrics**: per-partition row counts come from the written
  files' parquet footers (pure metadata reads — no extra Spark job), not
  from re-reading the snapshot (whose coalesced input splits measured the
  READ layout, not the skew that was written).
"""

from __future__ import annotations

import glob
import json
import os
import time
from hashlib import blake2b

from pyspark.sql import DataFrame, SparkSession

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

    def _read_manifest(self, name: str) -> dict | None:
        _, manifest = self._paths(name)
        if not os.path.exists(manifest):
            return None
        try:
            with open(manifest) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, OSError):
            return None

    def _fingerprint_inputs(self, inputs: list[str] | None) -> str:
        """Digest of everything a stage consumed: upstream stage manifests
        (by their own digest + row count) or external paths (every file's
        relpath, size, mtime). Any change -> different fingerprint ->
        resume is refused and the stage rebuilds."""
        parts: list = []
        for inp in inputs or []:
            meta = self._read_manifest(inp)
            if meta is not None:  # upstream stage of this run
                parts.append(("stage", inp, meta.get("output_digest"),
                              meta.get("row_count")))
            elif os.path.isdir(inp):
                files = sorted(
                    (os.path.relpath(p, inp), os.path.getsize(p),
                     os.stat(p).st_mtime_ns)  # ns: same-second rewrites count
                    for p in glob.glob(os.path.join(inp, "**"), recursive=True)
                    if os.path.isfile(p))
                parts.append(("dir", inp, files))
            elif os.path.isfile(inp):
                parts.append(("file", inp, os.path.getsize(inp),
                              os.stat(inp).st_mtime_ns))
            else:
                parts.append(("missing", inp))
        return blake2b(
            json.dumps(parts, sort_keys=True).encode(), digest_size=8
        ).hexdigest()

    def has_valid(self, name: str, input_fingerprint: str | None = None) -> bool:
        meta = self._read_manifest(name)
        if meta is None or meta.get("status") != "committed":
            return False
        if input_fingerprint is not None and (
                meta.get("input_fingerprint") != input_fingerprint):
            return False
        return True

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
        planning cost. ``inputs`` (stage names and/or paths) gate the resume:
        a manifest whose recorded input fingerprint no longer matches is
        rebuilt, not served."""
        data_dir, manifest = self._paths(name)
        fp = self._fingerprint_inputs(inputs)
        stale = (self._read_manifest(name) is not None
                 and not self.has_valid(name, fp))
        if self.has_valid(name, fp) and not force:
            with open(manifest) as fh:
                self.lineage.append(json.load(fh) | {"resumed": True})
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)

        # WRITE-layout skew metrics straight from the parquet footers
        import pyarrow.parquet as pq

        part_files = sorted(
            p for p in glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                                 recursive=True))
        partition_rows = {
            os.path.relpath(p, data_dir): pq.read_metadata(p).num_rows
            for p in part_files
        }
        out_digest = blake2b(
            json.dumps(sorted(partition_rows.items())).encode(),
            digest_size=8).hexdigest()
        meta = {
            "stage": name,
            "status": "committed",
            "inputs": inputs or [],
            "input_fingerprint": fp,
            "output_digest": out_digest,
            "row_count": int(sum(partition_rows.values())),
            "n_partitions": len(partition_rows),
            "partition_rows": partition_rows,
            "max_partition_rows": max(partition_rows.values(), default=0),
            "rebuilt_stale": stale,
            "wall_seconds": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(manifest, "w") as fh:
            json.dump(meta, fh, indent=1)
        self.lineage.append(meta | {"resumed": False})
        return self.spark.read.parquet(data_dir)

    def invalidate(self, name: str) -> None:
        _, manifest = self._paths(name)
        if os.path.exists(manifest):
            os.remove(manifest)

    def report(self) -> list[dict]:
        return list(self.lineage)
