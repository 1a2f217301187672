"""DSIR importance weights: engine vs a pure-python replay vs the
DuckDB twin, plus the semantic sanity the method exists for.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from pagerankproject_spark.text.dsir import (
    dsir_select,
    dsir_weights,
    sql_dsir_weights,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str):
    toks = text.lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_dsir(raw, target, B):
    def counts(docs):
        c: dict[int, int] = {}
        for _, t in docs:
            for f in _feats(t):
                b = _h60(f) % B
                c[b] = c.get(b, 0) + 1
        return c

    tc, rc = counts(target), counts(raw)
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for i, t in raw:
        feats = _feats(t)
        lw = sum(
            math.log(tc.get(_h60(f) % B, 0) + 1)
            - math.log(tt + B)
            - math.log(rc.get(_h60(f) % B, 0) + 1)
            + math.log(rt + B)
            for f in feats
        )
        out[i] = (len(feats), round(lw, 6))
    return out


RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices rose sharply today"),
    (3, "the dog sat on the rug"),
    (4, "buy cheap pills online now click here"),
    (5, ""),
]
TARGET = [
    (10, "a cat sat near a dog"),
    (11, "the dog and the cat sat together"),
]


def _dfs(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_dsir_three_way_parity(spark):
    B = 64
    raw, tgt = _dfs(spark)
    got = {
        r["doc_id"]: (r["n_features"], r["log_w"])
        for r in dsir_weights(raw, tgt, n_buckets=B).collect()
    }
    expected = _py_dsir(RAW, TARGET, B)
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0], k
        assert got[k][1] == pytest.approx(expected[k][1], abs=2e-6), k

    con = duckdb.connect()
    con.execute("create table rawdocs(doc_id bigint, text varchar)")
    con.executemany("insert into rawdocs values (?, ?)", RAW)
    con.execute("create table tgtdocs(doc_id bigint, text varchar)")
    con.executemany("insert into tgtdocs values (?, ?)", TARGET)
    q = "with " + sql_dsir_weights("rawdocs", "tgtdocs", n_buckets=B)
    sql = {r[0]: (r[1], r[2]) for r in con.execute(q).fetchall()}
    assert set(sql) == set(expected)
    for k in expected:
        assert sql[k][0] == expected[k][0], k
        assert sql[k][1] == pytest.approx(expected[k][1], abs=2e-6), k


def test_dsir_semantics_and_select(spark):
    # docs sharing the target's n-grams outscore spam/out-of-domain text
    raw, tgt = _dfs(spark)
    w = dsir_weights(raw, tgt, n_buckets=4096)
    got = {r["doc_id"]: r["log_w"] for r in w.collect()}
    assert got[1] > got[2] and got[3] > got[2]
    assert got[1] > got[4] and got[3] > got[4]
    assert got[5] == 0.0  # empty doc: no features, weight 0 (faithful
    # to the paper's raw log-ratio — callers filter empties upstream)
    top = [
        r["doc_id"]
        for r in dsir_select(w.filter("n_features > 0"), 2).collect()
    ]
    assert set(top) == {1, 3}
