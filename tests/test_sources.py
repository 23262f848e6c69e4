"""Source/sink roundtrips: edge text/CSV, pages/ranks JSON, validity filter
(SURVEY §2.1 S1-S7, F7)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from engine.sources import edges as es
from engine.sources import pages as ps


def test_edge_text_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(0, 1), (1, 2), (1, 2), (5, 0)], "src long, dst long")
    path = str(tmp_path / "edges_txt")
    es.write_edge_text(df, path)
    back = es.read_edge_text(spark, path)
    assert sorted((r.src, r.dst) for r in back.collect()) == [(0, 1), (1, 2), (1, 2), (5, 0)]
    assert es.num_nodes_from_edges(back) == 6


def test_edge_text_reader_skips_malformed(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "part.txt").write_text("0 1\nnot an edge\n2 3\n")
    back = es.read_edge_text(spark, str(p))
    assert sorted((r.src, r.dst) for r in back.collect()) == [(0, 1), (2, 3)]


def test_validate_edges_range_filter(spark):
    df = spark.createDataFrame([(0, 1), (-1, 2), (7, 3), (2, 9)], "src long, dst long")
    kept = es.validate_edges(df, n=5)
    assert sorted((r.src, r.dst) for r in kept.collect()) == [(0, 1), (2, 9)]


def test_edge_csv_sink_header(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://a/x", 3), ("http://a/y", 7)], "src string, tgt long"
    ).coalesce(1)
    path = str(tmp_path / "edges_csv")
    es.write_edge_csv(df, path)
    files = glob.glob(f"{path}/*.csv")
    assert files
    lines = open(files[0]).read().strip().splitlines()
    assert lines[0] == "source,target_id"
    assert set(lines[1:]) == {"http://a/x,3", "http://a/y,7"}


def test_pages_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "http://a/", "hello"), (1, "http://b/", "wörld")],
        "id long, url string, text string",
    )
    path = str(tmp_path / "pages_json")
    ps.write_pages_json(df, path)
    back = ps.read_pages_json(spark, path)
    assert sorted((r.id, r.url, r.text) for r in back.collect()) == [
        (0, "http://a/", "hello"),
        (1, "http://b/", "wörld"),
    ]


def test_ranks_json_roundtrip_and_sum(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "http://a/", 0.25), (1, "http://b/", 0.75)],
        "id long, url string, score double",
    )
    path = str(tmp_path / "ranks_json")
    ps.write_ranks_json(df, path)
    back = ps.read_ranks_json(spark, path)
    total = back.agg(F.sum("score")).collect()[0][0]
    assert abs(total - 1.0) < 1e-12
    assert back.count() == 2
