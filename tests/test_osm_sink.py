"""OSM XML sink: fragment structure, tag repair semantics, node interning."""

import glob
import xml.etree.ElementTree as ET

from rlis2osm_spark.operators.combine import combine, repair_and_filter_tags
from rlis2osm_spark.operators.osm_sink import write_osm_xml


def test_write_osm_xml(spark, synth_dir, tmp_path):
    streets = spark.read.parquet(f"{synth_dir}/streets.parquet")
    trails = spark.read.parquet(f"{synth_dir}/trails.parquet")
    bikes = spark.read.parquet(f"{synth_dir}/bike_routes.parquet")
    out = repair_and_filter_tags(combine(streets, trails, bikes))
    n_rows = out.count()

    stats = write_osm_xml(out.coalesce(2), str(tmp_path / "osm")).collect()
    assert sum(s.n_ways for s in stats) == n_rows

    files = sorted(glob.glob(str(tmp_path / "osm" / "part-*.osm")))
    assert files == [s.part_file for s in sorted(stats, key=lambda s: s.part_file)]
    total_ways = 0
    for f in files:
        root = ET.parse(f).getroot()
        assert root.tag == "osm"
        ways = root.findall("way")
        total_ways += len(ways)
        node_ids = {n.get("id") for n in root.findall("node")}
        for w in ways[:20]:
            # every nd ref resolves within the fragment
            for nd in w.findall("nd"):
                assert nd.get("ref") in node_ids
            tags = {t.get("k"): t.get("v") for t in w.findall("tag")}
            # S9: no empty/null tag values survive the sink
            assert all(v not in ("", "None", None) for v in tags.values())
    assert total_ways == n_rows


def test_api_facade(spark, synth_dir, tmp_path):
    """Reference-shaped workflow through the api module end-to-end."""
    from rlis2osm_spark import api
    from rlis2osm_spark.sources.catalog import Catalog

    cat = Catalog(synth_dir)
    combined = api.expand_translate_combine(spark, cat)
    dissolved = api.dissolve(combined)
    stats = api.to_osm_xml(dissolved, str(tmp_path / "osm_api")).collect()
    assert sum(s.n_ways for s in stats) == dissolved.count()
