"""Gopher quality rules: engine vs a pure-python replay of the spec vs
the DuckDB twin, with fixtures tripping each rule individually.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pagerankproject_spark.text.analysis import STOPWORDS
from pagerankproject_spark.text.gopher import gopher_rules, sql_gopher_rules

RULES = [
    "r_word_count", "r_mean_word_len", "r_symbol_ratio",
    "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
]


def _py_rules(text: str):
    toks = text.split()
    words = len(toks)
    word_chars = sum(len(t) for t in toks)
    symbols = text.count("#") + _nonoverlap(text, "...")
    lines = [ln.strip() for ln in text.split("\n")]
    n_lines = len(lines)
    bullet = sum(1 for ln in lines if ln[:1] in ("-", "*", "•"))
    ellipsis = sum(1 for ln in lines if ln.endswith("..."))
    alpha = sum(1 for t in toks if any(c.isascii() and c.isalpha() for c in t))
    stops = len({t for t in text.lower().split() if t in STOPWORDS})
    f = {
        "r_word_count": 50 <= words <= 100_000,
        "r_mean_word_len": word_chars >= 3 * words
        and word_chars <= 10 * words and words > 0,
        "r_symbol_ratio": symbols * 10 < words,
        "r_bullet_lines": bullet * 10 < n_lines * 9,
        "r_ellipsis_lines": ellipsis * 10 < n_lines * 3,
        "r_alpha_words": alpha * 10 > words * 8,
        "r_stopwords": stops >= 2,
    }
    f["pass_gopher"] = all(f.values())
    return f


def _nonoverlap(s: str, pat: str) -> int:
    n = i = 0
    while True:
        i = s.find(pat, i)
        if i < 0:
            return n
        n += 1
        i += len(pat)


GOOD = "the quick brown fox jumps over the lazy dog near a river bank " * 5
DOCS = [
    (1, GOOD),                                      # passes everything
    (2, "short doc"),                               # word count
    (3, " ".join(["supercalifragilistic"] * 60)),   # mean word len + stopwords
    (4, GOOD + " " + "#tag " * 20),                 # symbol ratio
    (5, "\n".join(["- " + GOOD[:40]] * 10)),        # bullet lines
    (6, "\n".join([GOOD[:40] + "..."] * 10)),       # ellipsis lines
    (7, GOOD + " " + "12345 " * 30),                # alpha words
    (8, ""),                                        # empty
]


def test_gopher_three_way_parity(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: {k: r[k] for k in RULES + ["pass_gopher"]}
        for r in gopher_rules(df).collect()
    }
    expected = {i: _py_rules(t) for i, t in DOCS}
    assert got == expected

    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text varchar)")
    con.executemany("insert into documents values (?, ?)", DOCS)
    q = "with " + sql_gopher_rules("documents")
    cols = ["doc_id"] + RULES + ["pass_gopher"]
    sql = {
        r[0]: dict(zip(cols[1:], r[1:]))
        for r in con.execute(q).fetchall()
    }
    assert sql == expected


def test_gopher_each_rule_trips(spark):
    expected = {i: _py_rules(t) for i, t in DOCS}
    assert expected[1]["pass_gopher"]
    assert not expected[2]["r_word_count"]
    assert not expected[3]["r_mean_word_len"]
    assert not expected[3]["r_stopwords"]
    assert not expected[4]["r_symbol_ratio"]
    assert not expected[5]["r_bullet_lines"]
    assert not expected[6]["r_ellipsis_lines"]
    assert not expected[7]["r_alpha_words"]
    assert not expected[8]["pass_gopher"]


@pytest.mark.parametrize("seed", [13, 77])
def test_gopher_random_fuzz(spark, seed):
    rng = random.Random(seed)
    vocab = ["the", "cat", "runs", "#", "a1", "...", "12", "•", "-", "of"]
    docs = [
        (
            i,
            "\n".join(
                " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
                for _ in range(rng.randint(1, 5))
            ),
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: {k: r[k] for k in RULES + ["pass_gopher"]}
        for r in gopher_rules(df).collect()
    }
    expected = {i: _py_rules(t) for i, t in docs}
    assert got == expected
    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text varchar)")
    con.executemany("insert into documents values (?, ?)", docs)
    cols = ["doc_id"] + RULES + ["pass_gopher"]
    sql = {
        r[0]: dict(zip(cols[1:], r[1:]))
        for r in con.execute("with " + sql_gopher_rules("documents")).fetchall()
    }
    assert sql == expected
