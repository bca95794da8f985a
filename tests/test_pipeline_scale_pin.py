"""End-to-end determinism pin for the benchmarked pipeline-scale chain
(VERDICT r4 #6): two full combine -> dissolve(ordered) -> OSM-sink runs at a
small replication factor must produce byte-identical parquet AND .osm
fragments.  Extends the per-operator two-run pin in tests/test_dissolve.py
to the exact chain bench.py --pipeline-scale measures (same code path:
bench.pipeline_scale_run)."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _part_hashes(root: str, suffix: str) -> list:
    """Content hashes in part-index order: part filenames embed per-run
    UUIDs, but the part-NNNNN prefix sorts identically across runs."""
    parts = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith("part-") and f.endswith(suffix):
                parts.append(os.path.join(dirpath, f))
    parts.sort(key=os.path.basename)
    out = []
    for p in parts:
        with open(p, "rb") as fh:
            out.append(hashlib.blake2b(fh.read(), digest_size=16).hexdigest())
    return out


def test_pipeline_scale_two_runs_byte_identical(spark, synth_dir, tmp_path):
    runs = []
    for i in (0, 1):
        out_dir = str(tmp_path / f"run{i}")
        rep = bench.pipeline_scale_run(spark, synth_dir, out_dir, mult=4,
                                       ordered=True)
        runs.append({
            "report": rep,
            "parquet": _part_hashes(rep["dissolved_parquet"], ".parquet"),
            "osm": _part_hashes(rep["osm_dir"], ".osm"),
        })
    a, b = runs
    assert a["report"]["n_input_ways"] == b["report"]["n_input_ways"]
    assert a["report"]["n_dissolved_ways"] == b["report"]["n_dissolved_ways"]
    assert a["report"]["osm_bytes"] == b["report"]["osm_bytes"]
    # byte-identical artifacts, file by file
    assert a["parquet"] and a["parquet"] == b["parquet"]
    assert a["osm"] and a["osm"] == b["osm"]
