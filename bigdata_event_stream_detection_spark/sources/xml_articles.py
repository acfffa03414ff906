"""Raw newspaper-XML article source — generic analog of the reference's
StAX scan (``input/RawArticleInputStream.java:59-159``), kept for parity
with corpora that are not yet pre-tokenized.

Shape: one XML file per year (``articles<year>.xml``) containing
``<article>`` elements with child fields ``name``, ``id``, ``page_no``,
``publication``, ``issue_date`` (``dd/MM/yyyy-HH``), ``full_text``.

Spark-first mapping:
  * file-list pruning by time window (S2, ``TimePeriod.java:54-63``) —
    prune *before* the scan by parsing the year out of each file name;
  * parallel multi-file scan (S3, ``InputParser.java:147-179``) — one
    task per file via ``binaryFile`` + ``mapInPandas`` (files are
    per-year shards, so this matches the reference's parallelism);
  * scan-time predicates (S4/S5) — date-window and page filters applied
    during parse, before any row materializes.

The parse itself uses the stdlib ``iterparse`` (streaming pull parser —
the StAX equivalent) inside an Arrow-batched kernel. Output rows are
the RawArticle schema; feed them to ``sources.tokenize`` to reach the
engine's native pre-tokenized shape.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_ARTICLE_SCHEMA = (
    "doc_id string, title string, page int, ts timestamp, "
    "source string, text string"
)

_YEAR_RE = re.compile(r"articles(\d{4})\.xml$")
_DATE_FMT = "%d/%m/%Y-%H"


def _parse_articles(payload: bytes, source: str,
                    min_ts, max_ts, max_page: int | None):
    """Streaming parse of one year-file; yields RawArticle tuples.

    Field dispatch mirrors RawArticleInputStream.java:119-159; the
    noon-forcing of dates (:138-140) is preserved so timestamps match
    the reference's semantics.
    """
    for _, elem in ET.iterparse(io.BytesIO(payload)):
        if elem.tag != "article":
            continue
        fields = {c.tag: (c.text or "") for c in elem}
        elem.clear()
        page = int(fields.get("page_no") or 0)
        if max_page is not None and page > max_page:
            continue  # S5 scan-time page predicate
        raw_date = fields.get("issue_date") or fields.get("publication") or ""
        try:
            ts = datetime.strptime(raw_date.strip(), _DATE_FMT)
        except ValueError:
            continue
        ts = ts.replace(hour=12)  # reference forces noon
        if min_ts is not None and ts < min_ts:
            continue  # S4 scan-time date predicate
        if max_ts is not None and ts >= max_ts:
            continue
        yield (
            fields.get("id") or "",
            fields.get("name") or "",
            page,
            ts,
            source,
            fields.get("full_text") or "",
        )


def read_xml_articles(
    spark: SparkSession,
    path_glob: str,
    source: str | None = None,
    time_window: tuple[datetime, datetime] | None = None,
    max_page: int | None = 3,
) -> DataFrame:
    """Scan year-sharded article XML into RawArticle rows.

    ``time_window`` prunes whole files by the year in their name before
    any byte is read (partition-pruning analog), then re-applies the
    exact predicate per article during parse.
    """
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content")
    if time_window is not None:
        lo, hi = time_window
        years = list(range(lo.year, hi.year + 1))
        # S2: prune files whose year cannot overlap the window
        year_expr = F.regexp_extract(F.col("path"), r"articles(\d{4})\.xml", 1)
        files = files.filter(year_expr.cast("int").isin(years))
        min_ts, max_ts = lo, hi
    else:
        min_ts = max_ts = None

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _YEAR_RE.search(path)
                src = source or (m.group(1) if m else "unknown")
                rows.extend(_parse_articles(
                    bytes(content), src, min_ts, max_ts, max_page))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "title", "page", "ts", "source", "text"])

    return files.mapInPandas(parse, schema=RAW_ARTICLE_SCHEMA)


def articles_to_documents(articles: DataFrame) -> DataFrame:
    """RawArticle rows -> the documents shape consumed by
    sources.tokenize (doc_id, text, source + event time column)."""
    return articles.select(
        "doc_id",
        "text",
        "source",
        F.col("ts").alias("event_time"),
    )


def write_year_shards(articles: list[tuple], out_dir: str) -> list[str]:
    """Test helper: write (doc_id, title, page, date_str, text) tuples
    into per-year ``articles<year>.xml`` files (the reference layout)."""
    import os
    from collections import defaultdict

    by_year: dict[str, list[tuple]] = defaultdict(list)
    for art in articles:
        year = art[3].split("/")[2].split("-")[0]
        by_year[year].append(art)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for year, arts in by_year.items():
        root = ET.Element("articles")
        for doc_id, title, page, date_str, text in arts:
            a = ET.SubElement(root, "article")
            ET.SubElement(a, "id").text = doc_id
            ET.SubElement(a, "name").text = title
            ET.SubElement(a, "page_no").text = str(page)
            ET.SubElement(a, "issue_date").text = date_str
            ET.SubElement(a, "full_text").text = text
        p = f"{out_dir}/articles{year}.xml"
        ET.ElementTree(root).write(p, encoding="utf-8")
        paths.append(p)
    return paths
