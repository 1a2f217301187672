"""Crawl-snapshot maintenance over the Common-Crawl-style pages table
(input_hint schema: url, warc_ts, html, text, lang) — engine-added
ingestion operators (SURVEY.md §2 round-2 additions).

A crawl re-fetches pages: the raw table holds MANY rows per url, one
per capture (warc_ts). Almost every downstream consumer (outlink
extraction, the link graph, text pipelines) wants exactly one row per
url — the latest capture. At 10^12 rows this must be ONE combinable
aggregation, not a window sort: `max(struct(ts, tiebreak, payload...))`
partial-aggregates map-side (each partition keeps one candidate row per
url before the shuffle), whereas `row_number() over (partition by url
order by ts desc)` ships every capture to the url's reducer and sorts
there. Struct comparison is lexicographic over the leading
(ts, tiebreak) fields, so the payload columns never influence the
winner as long as (ts, tiebreak) is unique per url — the caller names
the tiebreak column precisely to guarantee that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshots(
    pages: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    tiebreak: str | None = None,
    assert_unique: bool = False,
) -> DataFrame:
    """One row per `key`: the row with the greatest (`ts`, `tiebreak`).

    `tiebreak` (a column whose (ts, tiebreak) pair is unique per key —
    e.g. a capture id) makes the winner deterministic when a url is
    captured twice in the same instant; None asserts ts alone is unique
    per key. Output keeps every input column, original names, key first.

    If the uniqueness precondition is violated, ties break by
    lexicographic payload comparison here but by arbitrary row order in
    the row_number twin — a silent cross-engine divergence. Pass
    `assert_unique=True` to pay one cheap aggregation (same shuffle key
    as the main agg, counts only) that raises ValueError on the first
    duplicated (key, ts[, tiebreak]) group instead.
    """
    payload = [c for c in pages.columns if c not in (key, ts, tiebreak)]
    order = [ts] + ([tiebreak] if tiebreak else [])
    if assert_unique:
        dupes = (
            pages.groupBy(key, *order)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dupes:
            r = dupes[0]
            raise ValueError(
                "latest_snapshots: (key, ts"
                + (", tiebreak" if tiebreak else "")
                + f") is not unique — e.g. {tuple(r)[:-1]} appears {r['n']} times; "
                "winner would be payload-order-dependent"
            )
    packed = F.max(F.struct(*order, *payload)).alias("s")
    latest = pages.groupBy(key).agg(packed)
    return latest.select(key, *[F.col(f"s.{c}").alias(c) for c in order + payload])


def sql_latest_snapshots(
    pages_rel: str,
    columns: list[str],
    key: str = "url",
    ts: str = "warc_ts",
    tiebreak: str | None = None,
) -> str:
    """DuckDB twin: row_number over (ts desc, tiebreak desc) — same
    winner because (ts, tiebreak) is unique per key; `columns` is the
    full input column list in output order (key first).

    Divergence mode if that precondition is violated: this twin picks
    an arbitrary row among the tied group (row_number with an
    under-specified ORDER BY), while the engine's max(struct) picks the
    lexicographically-greatest payload — the results differ silently.
    Use latest_snapshots(assert_unique=True) to fail fast instead.
    """
    order = f"{ts} desc" + (f", {tiebreak} desc" if tiebreak else "")
    out = ", ".join([key] + [c for c in columns if c != key])
    return f"""
    select {out} from (
        select *, row_number() over (partition by {key} order by {order}) as rn
        from {pages_rel}
    ) where rn = 1
    """
