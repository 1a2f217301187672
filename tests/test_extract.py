"""T3 extraction tests (SURVEY §5.2): link-plan fidelity, byte-identical
text invariant, sql/arrow implementation equivalence."""

from __future__ import annotations

from fixtures.pages import make_pages
from pagerankproject_spark.ingest.extract import (
    extract_outlinks,
    extracted_text,
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _pages_df(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        PAGES_SCHEMA,
    )


def test_extraction_matches_link_plan(spark):
    rows, expected_edges, _ = make_pages(seed=42, n_pages=80)
    pages = _pages_df(spark, rows)
    got = [(r["src"], r["dst"]) for r in extract_outlinks(pages).collect()]
    assert sorted(got) == sorted(expected_edges)


def test_sql_and_arrow_impls_identical(spark):
    rows, _, _ = make_pages(seed=1, n_pages=40)
    pages = _pages_df(spark, rows)
    sql = sorted(
        (r["src"], r["dst"]) for r in extract_outlinks(pages, "sql").collect()
    )
    arrow = sorted(
        (r["src"], r["dst"]) for r in extract_outlinks(pages, "arrow").collect()
    )
    assert sql == arrow


def test_text_byte_identical_per_url(spark):
    """The binding per-row invariant (BASELINE.json input_hint)."""
    rows, _, expected_text = make_pages(seed=42, n_pages=60)
    pages = _pages_df(spark, rows)
    got = {r["url"]: r["text"].encode("utf-8") for r in extracted_text(pages).collect()}
    assert got == expected_text


def test_html_column_pruned_from_text_plan(spark):
    """Plan assertion (T4): reading `text` must not scan `html`."""
    import tempfile

    rows, _, _ = make_pages(seed=2, n_pages=20)
    with tempfile.TemporaryDirectory() as d:
        _pages_df(spark, rows).write.mode("overwrite").parquet(d)
        df = extracted_text(spark.read.parquet(d))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "html" not in plan
        assert "ReadSchema" in plan or "Scan" in plan


def test_build_edges_pages_to_ranks_end_to_end(spark, tmp_path):
    """Lifecycle entry #1: pages table -> build_edges -> pagerank."""
    from pagerankproject_spark.graph.pagerank import pagerank
    from pagerankproject_spark.ingest.edges import build_edges
    from pagerankproject_spark.oracle import numpy_ref as oracle

    rows, expected_edges, _ = make_pages(seed=13, n_pages=60)
    pages = spark.createDataFrame(rows)
    g = build_edges(spark, pages)
    res = pagerank(spark, g, epsilon=1e-7, max_iterations=100)
    got = {r["url"]: r["x"] for r in res.ranks.collect()}

    want, _ = oracle.pagerank_by_url(expected_edges, epsilon=1e-7, max_iterations=100)
    assert set(got) == set(want)
    for url, w in want.items():
        assert abs(got[url] - w) < 1e-6
    g.unpersist()


def test_empty_graph_fails_fast(spark):
    import pytest as _pytest

    from pagerankproject_spark.ingest.edges import build_graph_tables

    # both endpoints match the drop-regex -> nothing survives
    edges = spark.createDataFrame(
        [("site.com/", "site.com/a/b/")], "src string, dst string"
    )
    with _pytest.raises(ValueError, match="empty graph"):
        build_graph_tables(spark, edges)


def test_pages_job_cli_end_to_end(spark, tmp_path):
    """Flag wiring of the pages pipeline job (in-process subprocess run
    on local[4]; the spark-submit path itself is covered in
    test_spark_submit.py)."""
    import subprocess
    import sys
    from pathlib import Path

    rows, _, _ = make_pages(seed=3, n_pages=40)
    pages_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(rows).write.parquet(pages_path)
    out_path = str(tmp_path / "ranks")

    repo = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [
            sys.executable, str(repo / "jobs" / "pages_job.py"),
            "--pages", pages_path,
            "--output", out_path,
            "--master", "local[4]",
            "--epsilon", "1e-6",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ranks = spark.read.parquet(out_path)
    assert ranks.columns == ["id", "url", "x"] or set(ranks.columns) == {"id", "url", "x"}
    assert ranks.count() > 0


def test_anchor_extraction_hand_cases(spark):
    import datetime

    from pagerankproject_spark.ingest.extract import extract_anchors

    ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    html = (
        b'<a href="a.com/x" rel="nofollow">Click here</a>'
        b'<a href="b.com/y">second link</a>'
        b'<a href="c.com/z">unclosed'
        b'<a href="d.com/w"><b>nested markup</b></a>'
    )
    pages = spark.createDataFrame(
        [("p1", ts, html, "t", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in extract_anchors(pages).collect()
    )
    # only cleanly-closed, markup-free anchors extract (module contract)
    assert got == [
        ("p1", "a.com/x", "Click here"),
        ("p1", "b.com/y", "second link"),
    ]


def test_anchor_sql_and_arrow_impls_identical(spark):
    from pagerankproject_spark.ingest.extract import extract_anchors

    rows, _, _ = make_pages(seed=7, n_pages=40)
    pages = _pages_df(spark, rows)
    sql = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in extract_anchors(pages, "sql").collect()
    )
    arrow = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in extract_anchors(pages, "arrow").collect()
    )
    assert sql == arrow
    assert len(sql) > 0
    assert all(a.startswith("link ") for _, _, a in sql)  # make_pages anchors


def test_latest_snapshots_keeps_max_ts_row(spark):
    import datetime

    from pagerankproject_spark.ingest.snapshots import latest_snapshots

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def at(h):
        return t0 + datetime.timedelta(hours=h)

    rows = [
        ("u1", at(0), 1, "old"),
        ("u1", at(5), 2, "new"),
        ("u2", at(3), 3, "only"),
        ("u3", at(7), 4, "tie-low"),
        ("u3", at(7), 5, "tie-high"),  # same ts: tiebreak id wins
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, cap_id long, body string"
    )
    got = {
        r["url"]: (r["warc_ts"].replace(tzinfo=datetime.timezone.utc), r["cap_id"], r["body"])
        for r in latest_snapshots(df, tiebreak="cap_id").collect()
    }
    assert got == {
        "u1": (at(5), 2, "new"),
        "u2": (at(3), 3, "only"),
        "u3": (at(7), 5, "tie-high"),
    }


def test_latest_snapshots_plan_partial_aggregates(spark):
    import datetime

    from pagerankproject_spark.ingest.snapshots import latest_snapshots

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    df = spark.createDataFrame(
        [("u", t0, 1, "x")], "url string, warc_ts timestamp, cap_id long, body string"
    )
    out = latest_snapshots(df, tiebreak="cap_id")
    jvm = spark._sc._jvm
    p = jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # one combinable agg, no window sort: map-side keeps one candidate
    # per url before the shuffle (the 10^12-row requirement)
    assert "partial_max" in p
    assert "Window" not in p


def test_latest_snapshots_assert_unique(spark):
    import datetime

    import pytest

    from pagerankproject_spark.ingest.snapshots import latest_snapshots

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    dup = spark.createDataFrame(
        [("u", t0, 1, "a"), ("u", t0, 1, "b")],
        "url string, warc_ts timestamp, cap_id long, body string",
    )
    with pytest.raises(ValueError, match="not unique"):
        latest_snapshots(dup, tiebreak="cap_id", assert_unique=True)
    # unique input passes the check and returns normally
    ok = spark.createDataFrame(
        [("u", t0, 1, "a"), ("u", t0, 2, "b")],
        "url string, warc_ts timestamp, cap_id long, body string",
    )
    got = latest_snapshots(ok, tiebreak="cap_id", assert_unique=True).collect()
    assert [(r["url"], r["cap_id"]) for r in got] == [("u", 2)]


def test_anchor_unicode_whitespace_sql_arrow_agree(spark):
    import datetime

    from pagerankproject_spark.ingest.extract import extract_anchors, extract_outlinks

    ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    # NBSP after '<a': Java regex / RE2 \s are ASCII-only, so NEITHER
    # impl may extract it (re.ASCII pins the python twin)
    html = '<a href="a.com/x">nb</a><a href="b.com/y">ok</a>'.encode()
    pages = spark.createDataFrame(
        [("p1", ts, html, "t", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    for fn in (extract_anchors, extract_outlinks):
        sql = sorted(map(tuple, fn(pages, "sql").collect()))
        arrow = sorted(map(tuple, fn(pages, "arrow").collect()))
        assert sql == arrow
        assert all("a.com/x" not in r for row in sql for r in row)


def test_anchor_term_index_matches_python_replay(spark):
    from pagerankproject_spark.ingest.extract import anchor_term_index

    rows = [
        ("a.com", "t.com", "Best Widgets"),
        ("b.com", "t.com", "best widgets best"),   # repeat within one src
        ("c.com", "u.com", "   "),                  # blank anchor: no terms
        ("t.com", "t.com", "self best"),            # self-anchor: excluded
        ("a.com", "u.com", "widgets"),
    ]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    got = {
        (r["dst"], r["term"]): (r["n_src"], r["n_occ"])
        for r in anchor_term_index(df).collect()
    }
    assert got == {
        ("t.com", "best"): (2, 3),      # a.com once + b.com twice
        ("t.com", "widgets"): (2, 2),
        ("u.com", "widgets"): (1, 1),
    }
