"""OSM XML sink (SURVEY §2.1 S8/S9): the reference shells out to ogr2osm
(main.py:248-257) with ``-e 2913`` — reprojecting RLIS' EPSG:2913 feet to
WGS84 — and the tag-repair plugin (repair_keys.py), producing ONE
``rlis.osm``.  Here the sink is two stages, both covered:

1. ``write_osm_xml`` — distributed: each partition serializes its ways +
   interned nodes to one ``part-*.osm`` fragment via ``mapInPandas``
   (Arrow-batched), coordinates reprojected to lat/lon (spatial/proj.py),
   negative ids per OSM convention for new objects.
2. ``merge_fragments`` — single-writer merge into one artifact (the .osm
   file is inherently a one-file deliverable, same as the reference):
   streams fragments twice (nodes then ways), deduplicates nodes by id,
   and fails loudly if two distinct coordinates ever hashed to one id.

Id allocation is deterministic across partitions without coordination:
node ids come from a blake2b-64 of the exact 16 coordinate bytes — the
same exact-float interning rule as the dissolve stage (dissolve.py:
144-153) — so identical endpoints get identical ids in every fragment and
collapse on merge.  (Round 1 used crc32|adler32, whose high half has poor
entropy on 16-byte input; blake2b keeps the full 62-bit id space honest.)
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from hashlib import blake2b
from struct import pack
from xml.sax.saxutils import quoteattr

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from rlis2osm_spark.functions import wkb
from rlis2osm_spark.spatial.proj import feet_to_lonlat

_OUT_SCHEMA = StructType([
    StructField("part_file", StringType()),
    StructField("n_ways", LongType()),
    StructField("n_nodes", LongType()),
    StructField("n_null_geoms", LongType()),  # skipped rows, surfaced loudly
])


def _node_id_from_key(key: bytes) -> int:
    """Deterministic negative node id from the exact 16 coordinate bytes."""
    h = int.from_bytes(blake2b(key, digest_size=8).digest(), "little")
    return -(h % (1 << 62)) - 1


def _node_id(x: float, y: float) -> int:
    """Deterministic negative node id from the exact coordinate bytes."""
    return _node_id_from_key(pack("<2d", x, y))


def write_osm_xml(
    df: DataFrame,
    out_dir: str,
    geom_col: str = "geometry",
    tags_col: str = "tags",
    reproject: bool = True,
) -> DataFrame:
    """Write one .osm fragment per partition; returns per-partition stats.

    Expects the sink-assembled frame (repair_and_filter_tags): a map<k,v>
    ``tags`` column with ''/null values already dropped (S9 semantics).
    ``reproject=True`` converts EPSG:2913 feet to WGS84 lat/lon (the
    reference's ``ogr2osm -e 2913`` step); False keeps source coordinates
    (debug only — not valid OSM XML).

    Staged write (ADVICE r2): tasks emit ``part-*.osm.tmp``, the action
    runs EAGERLY here, and only after it succeeds are the previous
    ``part-*.osm`` fragments removed and the staging files atomically
    promoted — a failed or never-materialized run can no longer destroy
    the prior deliverable or leave a partial fragment set that
    merge_fragments would silently include. Returns the per-partition
    stats as a small local DataFrame (already materialized).

    **Filesystem contract** (ADVICE r3): tasks write fragments and the
    driver promotes them, so ``out_dir`` must be a filesystem BOTH see —
    local mode (one machine) or a shared mount (NFS/FUSE-mounted object
    store) on a cluster; a driver-invisible executor-local path fails
    loudly at promotion, not silently. The expected fragment set is
    recorded in ``_fragments.json`` BEFORE promotion begins, so a crash
    mid-promotion leaves a manifest that ``merge_fragments`` validates
    against by default — a mixed-generation directory is rejected, never
    silently merged (ADVICE r3)."""
    import glob as _glob

    def serialize(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        path = os.path.join(out_dir, f"part-{pid:05d}.osm.tmp")
        # intern on the exact 16 coordinate bytes (the dissolve rule);
        # insertion order = first occurrence, so fragment bytes stay
        # deterministic
        node_keys: dict[bytes, tuple] = {}  # coord bytes -> (x, y) feet
        ways: list[tuple[int, list[bytes], dict]] = []
        n_null = 0
        for pdf in frames:
            for i in range(len(pdf)):
                geom = pdf[geom_col].iloc[i]
                if geom is None:
                    n_null += 1
                    continue
                tags = pdf[tags_col].iloc[i] or {}
                # deterministic, partition-disjoint negative way ids
                wid = -((pid << 32) + len(ways)) - 1
                refs = []
                for line in wkb.decode_lines(bytes(geom)):
                    for x, y in line:
                        key = pack("<2d", float(x), float(y))
                        if key not in node_keys:
                            node_keys[key] = (float(x), float(y))
                        refs.append(key)
                ways.append((wid, refs, dict(tags)))

        # one blake2b per UNIQUE node, not per vertex occurrence (r5 —
        # shared endpoints/vertices repeat ~4-5x on street topology); an id
        # collision between two DISTINCT coordinate keys still fails loudly
        ids: dict[bytes, int] = {}
        id_owner: dict[int, bytes] = {}
        for key, xy in node_keys.items():
            nid = _node_id_from_key(key)
            other = id_owner.get(nid)
            if other is not None:
                raise ValueError(
                    f"node id collision within fragment: {nid} for "
                    f"{node_keys[other]} vs {xy}")
            id_owner[nid] = key
            ids[key] = nid

        if node_keys and reproject:
            import numpy as np

            xs = np.fromiter((xy[0] for xy in node_keys.values()),
                             dtype=np.float64)
            ys = np.fromiter((xy[1] for xy in node_keys.values()),
                             dtype=np.float64)
            lons, lats = feet_to_lonlat(xs, ys)  # one vectorized batch
        else:
            lons = [xy[0] for xy in node_keys.values()]
            lats = [xy[1] for xy in node_keys.values()]

        with open(path, "w", encoding="utf-8") as fh:
            buf: list[str] = []
            emit = buf.append

            def flush(force=False):
                if force or len(buf) >= 65536:
                    fh.write("".join(buf))
                    buf.clear()

            emit("<?xml version='1.0' encoding='UTF-8'?>\n")
            emit("<osm version='0.6' generator='rlis2osm_spark'>\n")
            for key, lon, lat in zip(node_keys, lons, lats):
                emit(f"  <node id='{ids[key]}' visible='true' "
                     f"lat='{float(lat)!r}' lon='{float(lon)!r}' />\n")
                flush()
            for wid, refs, tags in ways:
                emit(f"  <way id='{wid}' visible='true'>\n")
                for r in refs:
                    emit(f"    <nd ref='{ids[r]}' />\n")
                for k, v in sorted(tags.items()):
                    # quoteattr escapes &<>'" itself — wrapping escape()
                    # around the value double-escaped ampersands (r5 fix:
                    # 'A & B' used to serialize as 'A &amp;amp; B')
                    emit(f"    <tag k={quoteattr(str(k))} "
                         f"v={quoteattr(str(v))} />\n")
                emit("  </way>\n")
                flush()
            emit("</osm>\n")
            flush(force=True)
        yield pd.DataFrame(
            [(path, len(ways), len(node_keys), n_null)],
            columns=["part_file", "n_ways", "n_nodes", "n_null_geoms"])

    projected = df.select(geom_col, tags_col)  # analyzes (raises on bad input)
    os.makedirs(out_dir, exist_ok=True)
    for stale in _glob.glob(os.path.join(out_dir, "part-*.osm.tmp")):
        os.remove(stale)
    rows = projected.mapInPandas(serialize, _OUT_SCHEMA).collect()
    # the action succeeded: record the expected fragment set FIRST (the
    # manifest makes any later partial state detectable), then promote
    # (os.replace atomically overwrites a same-named old fragment), THEN
    # drop only the stale old fragments outside the new set — a failure
    # mid-promotion leaves every not-yet-promoted old fragment intact
    # (review r3) and a manifest that merge_fragments rejects the mix with
    staged = []
    seen: set[str] = set()
    for r in rows:
        dest = r.part_file[:-len(".tmp")]
        if dest in seen:  # duplicate stats row from a retried task
            continue
        seen.add(dest)
        staged.append((r.part_file, dest, r.n_ways, r.n_nodes,
                       r.n_null_geoms))
    # manifest records content digests, not just names: a rerun that
    # produces the SAME fragment names but crashes mid-promotion would
    # otherwise leave a same-name mixed generation the name-set check
    # cannot see (review r4)
    _write_fragment_manifest(out_dir, {
        os.path.basename(d): _fragment_digest(tmp)
        for tmp, d, *_ in staged})
    final_rows = []
    for tmp, dest, n_ways, n_nodes, n_null in staged:
        try:
            os.replace(tmp, dest)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"fragment {tmp} is not visible to the driver: write_osm_xml "
                "requires out_dir on a filesystem shared by driver and "
                "executors (local mode or an NFS/object-store mount) — see "
                "the docstring's filesystem contract") from None
        final_rows.append((dest, n_ways, n_nodes, n_null))
    for old in _glob.glob(os.path.join(out_dir, "part-*.osm")):
        if old not in seen:
            os.remove(old)
    return df.sparkSession.createDataFrame(final_rows, _OUT_SCHEMA)


_FRAG_MANIFEST = "_fragments.json"


def _fragment_digest(path: str) -> str:
    h = blake2b(digest_size=8)
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _write_fragment_manifest(out_dir: str, digests: dict[str, str]) -> None:
    import json

    tmp = os.path.join(out_dir, _FRAG_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"fragments": digests}, fh)
    os.replace(tmp, os.path.join(out_dir, _FRAG_MANIFEST))


_FRAGMENT_HEADER = ("<?xml version='1.0' encoding='UTF-8'?>\n",
                    "<osm version='0.6' generator='rlis2osm_spark'>\n")


def merge_fragments(out_dir: str, dest_path: str,
                    expect_fragments: int | None = None) -> dict:
    """Merge ``part-*.osm`` fragments into one artifact (reference
    main.py:248-257 emits a single ``rlis.osm``).

    Streams every fragment twice — nodes first, then ways — holding only
    the node-id -> lat/lon map (for cross-fragment dedup + collision
    check).  A single merged .osm is a one-machine deliverable by nature;
    at cluster scale the fragments themselves are the parallel output and
    this runs on the driver/edge node, like the reference's ogr2osm step.

    Guards (ADVICE r2/r3): the writer's ``_fragments.json`` manifest is
    validated BY DEFAULT — the on-disk fragment set must equal the set the
    writer promoted, so a crash mid-promotion (mixed old/new generations)
    or a foreign part-*.osm is rejected, never silently merged. Every
    fragment must also carry write_osm_xml's exact header, and
    ``expect_fragments`` cross-checks the count against the writer's stats
    rows. Raises ValueError if two distinct coordinates produced the same
    node id (hash collision) instead of silently corrupting way geometry.
    """
    import glob
    import json

    frags = sorted(glob.glob(os.path.join(out_dir, "part-*.osm")))
    manifest_path = os.path.join(out_dir, _FRAG_MANIFEST)
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)["fragments"]
        # back-compat: r4.0 manifests were a bare name list
        expected = (set(manifest) if isinstance(manifest, list)
                    else set(manifest.keys()))
        actual = {os.path.basename(f) for f in frags}
        if actual != expected:
            raise ValueError(
                f"fragment set does not match the writer manifest "
                f"({manifest_path}): missing={sorted(expected - actual)}, "
                f"unexpected={sorted(actual - expected)} — refusing to "
                "merge a mixed or partial fragment generation")
        if isinstance(manifest, dict):
            stale = [f for f in frags
                     if _fragment_digest(f) != manifest[os.path.basename(f)]]
            if stale:
                raise ValueError(
                    f"fragment content does not match the writer manifest "
                    f"for {[os.path.basename(f) for f in stale]} — a crash "
                    "mid-promotion left a same-name mixed generation; "
                    "re-run write_osm_xml before merging")
    if expect_fragments is not None and len(frags) != expect_fragments:
        raise ValueError(
            f"fragment count mismatch: writer reported {expect_fragments} "
            f"fragments but {out_dir} holds {len(frags)}")
    for f in frags:
        with open(f, encoding="utf-8") as fh:
            head = (fh.readline(), fh.readline())
        if head != _FRAGMENT_HEADER:
            raise ValueError(
                f"{f} was not written by write_osm_xml (unexpected header "
                f"{head!r}); refusing to merge foreign fragments")
    seen: dict[str, str] = {}
    n_ways = 0
    with open(dest_path, "w", encoding="utf-8") as out:
        out.write("<?xml version='1.0' encoding='UTF-8'?>\n")
        out.write("<osm version='0.6' generator='rlis2osm_spark'>\n")
        for f in frags:
            with open(f, encoding="utf-8") as fh:
                for line in fh:
                    if not line.startswith("  <node "):
                        continue
                    nid = line.split("id='", 1)[1].split("'", 1)[0]
                    coords = line.split("lat='", 1)[1]
                    prev = seen.get(nid)
                    if prev is None:
                        seen[nid] = coords
                        out.write(line)
                    elif prev != coords:
                        raise ValueError(
                            f"node id collision: {nid} maps to two "
                            f"coordinates ({prev!r} vs {coords!r})")
        in_way = False
        for f in frags:
            with open(f, encoding="utf-8") as fh:
                for line in fh:
                    if line.startswith("  <way "):
                        in_way = True
                        n_ways += 1
                    if in_way:
                        out.write(line)
                    if line.startswith("  </way>"):
                        in_way = False
        out.write("</osm>\n")
    return {"dest": dest_path, "n_nodes": len(seen), "n_ways": n_ways,
            "n_fragments": len(frags)}
