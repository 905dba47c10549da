"""Reference-true file ingestion: DataRow CSV (positional schema) and OSM
XML node parsing with max-version dedupe."""

import pytest

from hilbert_curve_spark.sources import readers

OSM_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="101" lat="52.4800" lon="-1.9020" version="1"/>
  <node id="101" lat="52.4801" lon="-1.9025" version="3"/>
  <node id="101" lat="52.4799" lon="-1.9010" version="2"/>
  <node id="202" version="1" lat="52.5000" lon="-1.8000"/>
  <node id="303" lat="52.6000" lon="-1.7000" version="5">
    <tag k="amenity" v="pub"/>
  </node>
  <way id="900" version="1">
    <nd ref="101"/>
  </way>
</osm>
"""


@pytest.fixture(scope="module")
def osm_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("osm") / "fixture.osm"
    p.write_text(OSM_XML)
    return str(p)


def test_osm_nodes_parse_all_occurrences(spark, osm_path):
    nodes = readers.read_osm_nodes(spark, osm_path).collect()
    assert len(nodes) == 5  # way/nd/tag lines are not nodes
    by_id = {}
    for r in nodes:
        by_id.setdefault(r["osm_id"], []).append(r["version"])
    assert sorted(by_id["101"]) == [1, 2, 3]
    # attribute order must not matter
    assert by_id["202"] == [1]


def test_osm_latest_keeps_max_version(spark, osm_path):
    latest = {
        r["osm_id"]: (r["latitude"], r["longitude"])
        for r in readers.osm_latest_nodes(readers.read_osm_nodes(spark, osm_path)).collect()
    }
    assert latest["101"] == ("52.4801", "-1.9025")  # version 3 wins
    assert set(latest) == {"101", "202", "303"}


def test_datarow_csv_roundtrip(spark, sf_dir, tmp_path_factory):
    from hilbert_curve_spark.operators.encode import encode_documents
    from hilbert_curve_spark.sources.interleave import build_documents

    geo = encode_documents(build_documents(spark, sf_dir, amp=2))
    path = str(tmp_path_factory.mktemp("csv") / "datarow")
    readers.write_datarow_csv(geo, path)
    back = readers.read_datarow_csv(spark, path)
    assert back.count() == geo.count()
    # positional schema: types are declared, not inferred
    assert [f.dataType.simpleString() for f in back.schema.fields[:3]] == [
        "bigint", "bigint", "bigint",
    ]
    # coordinate fidelity through the text round-trip
    orig = {(r["doc_id"], r["x"], r["y"]) for r in geo.select("doc_id", "x", "y").collect()}
    rt = {
        ("doc%010d" % r["fileID"], r["pointX"], r["pointY"])
        for r in back.collect()
    }
    assert rt == orig
    # the fixed 12 keyword columns are present and non-null
    assert sum(1 for f in back.schema.fields if f.name.startswith("kw")) == 12
