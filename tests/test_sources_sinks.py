"""XML article source (S1-S5 parity) and report sinks (S7/S8)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.sources.xml_articles import (
    articles_to_documents,
    read_xml_articles,
    write_year_shards,
)

ARTICLES = [
    ("a1", "Alpha", 1, "05/03/1914-08", "war begins in europe tonight"),
    ("a2", "Beta", 2, "20/07/1914-10", "markets react to the war news"),
    ("a3", "Gamma", 7, "21/07/1914-11", "page seven gossip column"),   # page>3
    ("a4", "Delta", 1, "02/01/1915-09", "peace talks stall again"),
    ("a5", "Epsilon", 3, "15/06/1916-18", "offensive on the somme"),
]


@pytest.fixture(scope="module")
def xml_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("xml"))
    write_year_shards(ARTICLES, d)
    return d


def test_xml_scan_parses_fields(spark, xml_dir):
    df = read_xml_articles(spark, xml_dir + "/*.xml", source="GDL")
    rows = {r["doc_id"]: r for r in df.collect()}
    # a3 dropped by the page predicate (S5)
    assert set(rows) == {"a1", "a2", "a4", "a5"}
    assert rows["a1"]["title"] == "Alpha"
    # noon forcing (RawArticleInputStream.java:138-140)
    assert rows["a1"]["ts"].hour == 12
    assert rows["a1"]["source"] == "GDL"


def test_xml_year_file_pruning(spark, xml_dir):
    window = (datetime(1914, 1, 1), datetime(1915, 1, 1))
    df = read_xml_articles(spark, xml_dir + "/*.xml", time_window=window)
    ids = {r["doc_id"] for r in df.collect()}
    assert ids == {"a1", "a2"}  # 1915/1916 files pruned + date predicate


def test_xml_to_documents_to_sequences(spark, xml_dir):
    from bigdata_event_stream_detection_spark.sources.tokenize import (
        build_lexicon,
    )

    docs = articles_to_documents(
        read_xml_articles(spark, xml_dir + "/*.xml", source="GDL"))
    lex = build_lexicon(docs.select("doc_id", "text"))
    assert lex.filter(F.col("word") == "war").count() == 1


def test_dot_sink(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sinks.reports import (
        write_evolution_dot,
    )
    from datetime import datetime as dt

    edges = spark.createDataFrame(
        [(dt(2015, 1, 1), 0, dt(2015, 1, 8), 1, 2.5),
         (dt(2015, 1, 8), 1, dt(2015, 1, 15), 2, 1.5)],
        "window1 timestamp, theme1 int, window2 timestamp, theme2 int, "
        "divergence double")
    out = str(tmp_path / "graph.dot")
    n = write_evolution_dot(edges, out)
    assert n == 2
    content = open(out).read()
    assert content.startswith("digraph") and "->" in content
    assert content.count("->") == 2


def test_strength_csv_sink(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sinks.reports import (
        write_strength_csv,
    )
    from datetime import datetime as dt

    ev = spark.createDataFrame(
        [(dt(2015, 1, 1), "GDL", 1, 10), (dt(2015, 1, 2), "GDL", 1, 12),
         (dt(2015, 1, 1), "GDL", 2, 3)],
        "window_start timestamp, source string, theme_id int, strength long")
    out = str(tmp_path / "strength")
    write_strength_csv(ev, out)
    themes = {d for d in os.listdir(out) if d.startswith("theme_id=")}
    assert themes == {"theme_id=1", "theme_id=2"}


def test_jsonl_documents_reader_quarantines_corrupt_lines(spark, tmp_path):
    from bigdata_event_stream_detection_spark.sources.jsonl import (
        read_jsonl_documents,
        read_jsonl_documents_stream,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}\n'
        'THIS IS NOT JSON {{{\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "b"}\n'
        '{"doc_id": 3, "text": "broken\n')
    good, bad = read_jsonl_documents(spark, str(p))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "hello world" and rows[2]["lang"] == "fr"
    bad_lines = [r["line"] for r in bad.collect()]
    assert len(bad_lines) == 2                      # counted, not dropped
    assert any("NOT JSON" in b for b in bad_lines)

    # streaming ingest of the same directory parses the same good rows
    stream = read_jsonl_documents_stream(spark, str(tmp_path) + "/*.jsonl")
    q = (stream.writeStream.format("memory").queryName("jsonl_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table("jsonl_stream").collect()}
    assert got == {1, 2}


def test_remap_token_ids_paths_agree_and_preserve_order(spark):
    from bigdata_event_stream_detection_spark.sources import tokenize as tk

    seqs = spark.createDataFrame(
        [("d1", [0, 3, 1, 3, 7], 5, "A"),
         ("d2", [7, 8], 2, "A"),          # fully out-of-mapping
         ("d3", [2, 0, 2], 3, "B")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    mapping = spark.createDataFrame(
        [(0, 100), (1, 101), (2, 102), (3, 103)], "old_id int, new_id int")

    # UNK fold: order preserved, unknowns become -1, n_tok recomputed
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
           for r in tk.remap_token_ids(seqs, mapping, unk_id=-1).collect()}
    assert got["d1"] == ([100, 103, 101, 103, -1], 5)
    assert got["d2"] == ([-1, -1], 2)
    assert got["d3"] == ([102, 100, 102], 3)

    # prune semantics (unk None): unknowns DROP, empty docs keep a row
    got2 = {r["doc_id"]: list(r["tokens"])
            for r in tk.remap_token_ids(seqs, mapping).collect()}
    assert got2 == {"d1": [100, 103, 101, 103], "d2": [], "d3": [102, 100, 102]}

    # the join fallback path must agree exactly with the map literal
    old_limit = tk._MAP_LITERAL_LIMIT
    tk._MAP_LITERAL_LIMIT = 1
    try:
        via_join = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
                    for r in tk.remap_token_ids(
                        seqs, mapping, unk_id=-1).collect()}
        via_join_prune = {r["doc_id"]: list(r["tokens"])
                          for r in tk.remap_token_ids(
                              seqs, mapping).collect()}
    finally:
        tk._MAP_LITERAL_LIMIT = old_limit
    assert via_join == got
    assert via_join_prune == got2
