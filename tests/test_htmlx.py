"""HTML -> text extraction (operators/htmlx.py): semantics on crafted
documents, graceful degradation on broken markup, and exact DuckDB
parity of the generated SQL twins over every case."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ffi_export_etl_spark.operators.htmlx import (
    extract_links,
    extract_title,
    extract_title_sql,
    html_to_text,
    html_to_text_sql,
    n_links_sql,
)

CASES = {
    "basic": (
        "<html><head><title>My Page</title></head>"
        "<body><h1>Head</h1><p>one two</p><p>three</p></body></html>"
    ),
    "script_style": (
        '<body><script type="text/javascript">var x = "1 < 2";</script>'
        "<p>kept</p><style>p { color: red }</style>done</body>"
    ),
    "comments": "<p>a<!-- hidden <b>bold</b> -->b</p>",
    "entities": "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"
    "&amp;lt;</p>",
    "inline_zero_width": "<p>cru<b>el</b>ty and <a href=\"http://x.y/\">link"
    "</a> text</p>",
    "free_text_lt": "<p>a < b and x <3 you</p>",
    "breaks": "line1<br>line2<br/>line3<hr>line4",
    "lists_tables": (
        "<ul><li>a</li><li>b</li></ul>"
        "<table><tr><td>c</td><td>d</td></tr></table>"
    ),
    "whitespace": "<p>  a\t b </p>\n\n\n\n<p> c </p>",
    "unclosed_script": "<body><script>var broken = 1; <p>gone</p></body>",
    "no_title": "<body><p>plain</p></body>",
    "upper_tags": "<BODY><P>up</P><BR>next</BODY>",
    "links": (
        '<a href="https://a.example/1">x</a>'
        '<A HREF = "http://b.example/2?q=1">y</A>'
        "<a href='single.example'>skipped-by-design</a>"
    ),
    "empty": "",
}


def _spark_results(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in CASES.items()], "k string, html string"
    )
    return {
        r["k"]: (r["t"], r["title"], r["links"])
        for r in df.select(
            "k",
            html_to_text("html").alias("t"),
            extract_title("html").alias("title"),
            extract_links("html").alias("links"),
        ).collect()
    }


def test_extraction_semantics(spark):
    got = _spark_results(spark)
    assert got["basic"][0] == "Head\none two\nthree"
    assert got["basic"][1] == "My Page"
    assert got["script_style"][0] == "kept\ndone"
    assert got["comments"][0] == "a b"
    assert got["entities"][0] == "A & B <tag> \"q\" 's' end&lt;"
    assert got["inline_zero_width"][0] == "cruelty and link text"
    assert got["free_text_lt"][0] == "a < b and x <3 you"
    assert got["breaks"][0] == "line1\nline2\nline3\nline4"
    # stacked block closes (</li></ul>) read as a paragraph break
    assert got["lists_tables"][0] == "a\nb\n\nc\nd"
    # blank runs cap at one empty line (paragraph break)
    assert got["whitespace"][0] == "a b\n\nc"
    # unclosed <script>: over-strip (drop the tail), never leak markup
    assert got["unclosed_script"][0] == ""
    assert got["no_title"][1] == ""
    assert got["upper_tags"][0] == "up\n\nnext"  # </P>+<BR> stack
    assert got["links"][2] == [
        "https://a.example/1",
        "http://b.example/2?q=1",
    ]
    assert got["empty"] == ("", "", [])


@pytest.mark.parametrize("k", sorted(CASES))
def test_duckdb_parity(spark, k):
    got = _spark_results(spark)[k]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"html": [CASES[k]]}))
    oracle = con.execute(
        f"SELECT {html_to_text_sql('html')} AS t,"
        f" {extract_title_sql('html')} AS title,"
        f" {n_links_sql('html')} AS n_links FROM t"
    ).fetchone()
    assert oracle[0] == got[0], k
    assert oracle[1] == got[1], k
    assert oracle[2] == len(got[2]), k


def test_real_corpus_parity(spark, sf_oracle):
    """Wrap every sf0.01 document in an HTML template and require exact
    Spark/DuckDB agreement on the extracted text — free text with real
    punctuation exercises the generic strip + entity rules broadly."""
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title><style>p{x:1}</style></head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    got = {
        r[0]: r[1]
        for r in wrapped.select(
            "doc_id", html_to_text("html").alias("t")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS FROM '{sf_oracle}/documents.parquet'"
    )
    sql_html = (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
        "'</title><style>p{x:1}</style></head><body><p>' || text || "
        "'</p></body></html>'"
    )
    oracle = dict(
        con.execute(
            f"SELECT doc_id, {html_to_text_sql(sql_html)} FROM documents"
        ).fetchall()
    )
    assert got == oracle
