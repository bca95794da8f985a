#!/usr/bin/env python
"""Round-7 optimization measurement harness (guide §1).

NOT the driver contract — bench.py is frozen for measurement. This file
exists to (a) time individual headline queries with the noop sink under
the exact session/config bench.py uses, (b) dump .explain("formatted")
plans to plans/r07/, and (c) iterate quickly (no capacity gates, small
repeat counts) while optimizing. Cited numbers go to OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--plans SUFFIX] [query ...]

With --plans before|after, writes plans/r07/<query>_<suffix>.txt for each
selected query. With no query args, runs the full HEADLINE list.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="write plans/r07/<q>_<SUFFIX>.txt per query")
    ap.add_argument("--legs", action="store_true",
                    help="also time ann/media legs")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE, _SCALING_CONF, _effective_cores_probe
    from rlis2osm_spark.driver_support import ensure_package_on_workers
    from rlis2osm_spark.queries import all_queries
    from rlis2osm_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES",
                          str(4 * 1024 * 1024))
    probe_before = _effective_cores_probe()
    spark = build_session(
        app_name="bench-extra-r07",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
        extra_conf=_SCALING_CONF,
    )
    ensure_package_on_workers(spark)
    queries = all_queries()
    names = args.queries or HEADLINE

    # same warmup as bench.py
    _materialize(queries["s2_tile_assignment_wkb"](spark, args.sf).limit(100))
    _materialize(queries["rlis_dissolve_cc"](spark, "/root/testdata/sf0.001"))

    if args.plans:
        os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
        for name in names:
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(REPO, "plans", "r07",
                                f"{name}_{args.plans}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}", file=sys.stderr)

    timings, spreads = {}, {}
    jvm_gc = spark.sparkContext._jvm.System.gc
    for name in names:
        spark.sparkContext.setJobDescription(f"r07 bench: {name}")
        _materialize(queries[name](spark, args.sf))  # warm
        runs = []
        for _ in range(args.repeats):
            jvm_gc()
            t0 = time.time()
            _materialize(queries[name](spark, args.sf))
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        spreads[name] = [round(r, 3) for r in sorted(runs)]
        print(f"  {name}: {timings[name]} {spreads[name]}", file=sys.stderr)

    legs = {}
    if args.legs:
        from rlis2osm_spark.queries.content2 import media_feature_legs
        for kind, frame in media_feature_legs(spark, args.sf).items():
            spark.sparkContext.setJobDescription(f"r07 media leg: {kind}")
            _materialize(frame)
            best = None
            for _ in range(args.repeats):
                t0 = time.time()
                _materialize(frame)
                el = time.time() - t0
                best = el if best is None else min(best, el)
            legs[kind] = round(best, 3)
            print(f"  media:{kind}: {legs[kind]}", file=sys.stderr)

    probe_after = _effective_cores_probe()
    spark.stop()
    print(json.dumps({
        "sf": args.sf, "total": round(sum(timings.values()), 3),
        "queries": timings, "spread": spreads, "media_legs": legs,
        "effective_cores_before": probe_before["effective_cores"],
        "effective_cores_after": probe_after["effective_cores"],
    }))


if __name__ == "__main__":
    main()
