"""PageRank (operators/pagerank.py): numpy power-iteration twin on a
known graph, mass conservation, dangling handling, DuckDB parity via an
unrolled MATERIALIZED CTE chain, and composition with the HTML link
extractor."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from ffi_export_etl_spark.operators.pagerank import pagerank

# (src, dst): a hub (0), a cycle (1->2->3->1), a dangling sink (4)
EDGES = [(0, 1), (0, 2), (0, 4), (1, 2), (2, 3), (3, 1), (1, 4)]
D = 0.85
K = 10


def _numpy_pr(edges, n, k=K, d=D):
    deg = np.zeros(n)
    for u, _ in edges:
        deg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(k):
        dangling = r[deg == 0].sum()
        nxt = np.full(n, (1 - d) / n + d * dangling / n)
        for u, v in edges:
            nxt[v] += d * r[u] / deg[u]
        r = nxt
    return r


def test_matches_numpy_twin(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _numpy_pr(EDGES, 5)
    assert set(got) == set(range(5))
    for i in range(5):
        assert got[i] == pytest.approx(want[i], rel=1e-9), i
    # total mass conserved by the dangling redistribution
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    # the hub's targets outrank the hub (nothing links to 0)
    assert got[0] == min(got.values())


def test_duplicate_edges_collapse_and_empty(spark):
    df = spark.createDataFrame(EDGES + EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _numpy_pr(EDGES, 5)
    for i in range(5):
        assert got[i] == pytest.approx(want[i], rel=1e-9), i
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).collect() == []


def _unrolled_sql(n_iter: int, d: float, base_rel: str) -> str:
    """The DuckDB twin: ONE renderer shared with the driver-gate oracle
    (queries/dedup_q.py pagerank_unrolled_ctes — the 'pagerank' arm of
    dedup_connected_components), so the pytest twin and the gate can
    never drift apart."""
    from ffi_export_etl_spark.queries.dedup_q import pagerank_unrolled_ctes

    return (
        "WITH "
        + pagerank_unrolled_ctes(n_iter, d, base_rel)
        + f"\nSELECT node, rank FROM pr_r{n_iter}"
    )


def test_duckdb_parity_synthetic_graph(spark, sf_oracle):
    """Deterministic link graph over the sf0.01 doc ids (two out-links
    per non-dangling doc, every third doc dangling) — Spark and the
    unrolled-CTE oracle agree to FP tolerance at 5 iterations."""
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    n_docs = docs.count()
    edges = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % n_docs).alias("dst"),
    ).unionAll(
        docs.filter(F.col("doc_id") % 3 == 1).select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % n_docs).alias("dst"),
        )
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS FROM '{sf_oracle}/documents.parquet'"
    )
    con.execute(f"""CREATE VIEW edges AS
        SELECT doc_id AS src, (doc_id * 7 + 1) % {n_docs} AS dst
        FROM documents WHERE doc_id % 3 != 0
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 3) % {n_docs}
        FROM documents WHERE doc_id % 3 = 1""")
    oracle = dict(con.execute(_unrolled_sql(5, D, "edges")).fetchall())
    assert set(got) == set(oracle)
    for node, rank in oracle.items():
        assert got[node] == pytest.approx(rank, rel=1e-9), node
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_composes_with_link_extraction(spark):
    """htmlx.extract_links -> explode -> pagerank: the crawl-frontier
    shape end-to-end."""
    from ffi_export_etl_spark.operators.htmlx import extract_links

    pages = spark.createDataFrame(
        [
            ("a", '<a href="b">x</a><a href="c">y</a>'),
            ("b", '<a href="c">z</a>'),
            ("c", '<a href="b">w</a>'),
        ],
        "url string, html string",
    )
    edges = pages.select(
        F.col("url").alias("src"),
        F.explode(extract_links("html")).alias("dst"),
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert set(got) == {"a", "b", "c"}
    # b and c exchange mass and outrank the unlinked root
    assert got["a"] < got["b"] and got["a"] < got["c"]


def test_rank_cli_html_mode(spark, tmp_path, capsys):
    """rank --html: crawled pages -> link extraction -> URL
    canonicalization -> PageRank, end to end; tracking-parameter and
    www variants collapse to one node."""
    import json

    pages = spark.createDataFrame(
        [
            ("http://a.example/", '<a href="http://b.example/p">x</a>'
             '<a href="http://WWW.b.example/p?utm_source=z">dup</a>'),
            ("http://b.example/p", '<a href="http://a.example/">y</a>'),
        ],
        "url string, html string",
    )
    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    out = str(tmp_path / "ranks")

    from ffi_export_etl_spark.__main__ import main

    rc = main(["rank", "--input", src, "--output", out, "--html"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_nodes"] == 2  # variants collapsed
    ranks = {r["node"]: r["rank"] for r in spark.read.parquet(out).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
