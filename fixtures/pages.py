"""§B fixture — Common-Crawl-style `pages` table generator.

Schema fixed by BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Contract: make_pages(seed, n_pages) returns (page_rows, expected_edges,
expected_text) where extraction of the html column MUST yield exactly
expected_edges, and the text column must be byte-identical (utf-8) to
expected_text per url. Pure Python, no Spark imports.
"""

from __future__ import annotations

import datetime
import random

LANGS = ["en", "es", "de", "zh"]


def make_pages(
    seed: int = 42, n_pages: int = 100
) -> tuple[list[dict], list[tuple[str, str]], dict[str, bytes]]:
    rng = random.Random(seed)
    urls = [f"www.example.com/article-{i}" for i in range(n_pages)]
    hubs = [f"www.example.com/topic/{k}" for k in range(max(2, n_pages // 20))]

    rows: list[dict] = []
    expected_edges: list[tuple[str, str]] = []
    expected_text: dict[str, bytes] = {}
    base_ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    for i, url in enumerate(urls):
        # link plan: 0..6 outlinks to articles + one hub (hub targets get
        # dropped later by the regex filter — extraction still reports them)
        k = rng.randrange(0, 7)
        targets = []
        for _ in range(k):
            t = urls[rng.randrange(n_pages)]
            targets.append(t)
        targets.append(hubs[i % len(hubs)])

        body_tokens = [f"tok{rng.randrange(1000)}" for _ in range(rng.randrange(5, 40))]
        text = " ".join(body_tokens)
        anchors = "".join(
            f'<a href="{t}">link {j}</a>\n' for j, t in enumerate(targets)
        )
        html = (
            f"<html><head><title>page {i}</title></head><body>\n"
            f"<p>{text}</p>\n{anchors}</body></html>"
        ).encode("utf-8")

        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + datetime.timedelta(seconds=i),
                "html": html,
                "text": text,
                "lang": LANGS[i % len(LANGS)],
            }
        )
        for t in targets:
            expected_edges.append((url, t))
        expected_text[url] = text.encode("utf-8")

    return rows, expected_edges, expected_text
