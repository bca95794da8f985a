#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "docs_per_sec": ...}

Each query is materialized with a noop sink (full pipeline execution, no
driver collect). The flagship tile-assignment throughput (documents/sec —
the BASELINE.json metric) is reported alongside.

`python bench.py --scaling` additionally runs the flagship job at two
parallelism levels (local[8] vs local[32]) in fresh JVMs and writes the
N->4N efficiency evidence to BENCH/BASELINE.md (sandbox proxy for the
two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "s2_tile_assignment_wkb",   # flagship: WKB -> cell (Arrow + native)
    "s3_tile_rollup",           # hierarchical tile agg
    "s5_knn_points",            # ring-candidate kNN
    "s6_raster_vector",         # raster<->vector cell join
    "q01_pricing_summary",      # wide scan + agg
    "q05_nation_revenue",       # multi-join
    "j2_overlay_fanout",        # broadcast build/probe + fan-out
    "t13_t20_trails",           # translation decision tree
    "d1_exact_dedup",           # exact dedup
    "d3_minhash_lsh",           # MinHash LSH
    "x1_text_quality",          # text analysis
    "w2_sessionization",        # windowed sessionization
    "rlis_dissolve_cc",         # connected-components dissolve
]


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def run_bench(sf_dir: str = SF_DIR, cpus: str = CPUS) -> dict:
    from rlis2osm_spark.driver_support import ensure_package_on_workers
    from rlis2osm_spark.queries import all_queries
    from rlis2osm_spark.session import build_session

    spark = build_session(
        app_name="rlis2osm_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    ensure_package_on_workers(spark)
    queries = all_queries()

    timings: dict[str, float] = {}
    # warm the JVM/Arrow path once so per-query numbers measure the engine
    _materialize(queries["s2_tile_assignment_wkb"](spark, sf_dir).limit(100))

    t_all = time.time()
    for name in HEADLINE:
        t0 = time.time()
        _materialize(queries[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    t0 = time.time()
    _materialize(queries["s2_tile_assignment_wkb"](spark, sf_dir))
    flagship_sec = time.time() - t0
    docs_per_sec = round(n_docs / flagship_sec, 1)

    spark.stop()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline query suite wall time (flagship: H3-style tile "
                  "assignment over interleaved documents)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": docs_per_sec,
        "cpus": int(cpus),
    }


def _scaling_child(cpus: str) -> dict:
    """Run flagship throughput probe in this process (invoked as child)."""
    from rlis2osm_spark.driver_support import ensure_package_on_workers
    from rlis2osm_spark.queries import all_queries
    from rlis2osm_spark.session import build_session

    spark = build_session(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    ensure_package_on_workers(spark)
    q = all_queries()
    flag = ["s2_tile_assignment_wkb", "s3_tile_rollup", "s5_knn_points",
            "rlis_dissolve_cc"]
    # warm-up
    _materialize(q["s2_tile_assignment_wkb"](spark, SF_DIR).limit(100))
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    t0 = time.time()
    for name in flag:
        _materialize(q[name](spark, SF_DIR))
    elapsed = time.time() - t0
    spark.stop()
    return {"cpus": int(cpus), "sec": round(elapsed, 3),
            "docs_per_sec": round(n_docs / elapsed, 1)}


def run_scaling() -> dict:
    results = []
    for cpus in ("8", "32"):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", cpus],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    r8, r32 = results
    speedup = r8["sec"] / r32["sec"]
    efficiency = round(speedup / 4.0, 3)
    report = {
        "n_parallelism": r8, "4n_parallelism": r32,
        "speedup": round(speedup, 3), "scaling_efficiency": efficiency,
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH/BASELINE — measured numbers\n\n"
            "North-rule scaling evidence (sandbox proxy: same job, same "
            "input, two local parallelism levels — no real cluster "
            "available; see BASELINE.md):\n\n"
            "| parallelism | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[8] (N) | {r8['sec']} | {r8['docs_per_sec']} |\n"
            f"| local[32] (4N) | {r32['sec']} | {r32['docs_per_sec']} |\n\n"
            f"speedup N->4N: **{report['speedup']}x**; scaling efficiency "
            f"(speedup/4): **{efficiency}** (target >= 0.8)\n\n"
            f"Flagship suite: tile assignment (WKB->cell), tile rollup, "
            f"ring-kNN, CC dissolve at sf dir `{SF_DIR}`.\n"
        )
    return report


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        print(json.dumps(_scaling_child(sys.argv[2])))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
