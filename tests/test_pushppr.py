"""Forward-push PPR: engine vs a pure-python replay of the synchronous
push rounds, vs the DuckDB recursive twin, and vs the exact dense
personalized-PageRank solve (ACL residual-invariant error bound).
"""

from __future__ import annotations

import random
from collections import defaultdict

import duckdb
import numpy as np
import pytest

from pagerankproject_spark.graph.pushppr import ppr_push, sql_ppr_push
from pagerankproject_spark.ingest.edges import build_graph_tables


def _py_push(pairs, seed, d=0.85, eps=1e-4, rounds=60):
    verts = sorted({u for e in pairs for u in e})
    outs: dict[str, list] = defaultdict(list)
    for s, t in pairs:
        outs[s].append(t)
    aug = {
        v: (
            [(t, 1.0 / len(outs[v])) for t in outs[v]]
            if outs[v]
            else [(seed, 1.0)]
        )
        for v in verts
    }
    od = {v: len(aug[v]) for v in verts}
    p: dict[str, float] = defaultdict(float)
    r: dict[str, float] = defaultdict(float)
    r[seed] = 1.0
    for _ in range(rounds):
        active = {v for v, rv in r.items() if rv > eps * od[v]}
        if not active:
            break
        nr: dict[str, float] = defaultdict(float)
        for v, rv in r.items():
            if v not in active:
                nr[v] += rv
        for v in active:
            p[v] += (1 - d) * r[v]
            for t, w in aug[v]:
                nr[t] += d * r[v] * w
        r = nr
    return {v: round(pv, 6) for v, pv in p.items() if pv > 0}


def _run_engine(spark, pairs, seed, **kw):
    edges = spark.createDataFrame(sorted(set(pairs)), "src string, dst string")
    g = build_graph_tables(spark, edges)
    rows = ppr_push(spark, g, seed, **kw).collect()
    g.unpersist()
    return {row["url"]: row["p"] for row in rows}


def _run_sql(pairs, seed, d=0.85, eps=1e-4, rounds=60):
    con = duckdb.connect()
    con.execute("create table edges(src varchar, dst varchar)")
    con.executemany("insert into edges values (?, ?)", sorted(set(pairs)))
    q = (
        "with vertices as "
        "(select src as url from edges union select dst from edges),\n"
        + sql_ppr_push(seed, damping=d, eps=eps, max_rounds=rounds)
    )
    return {r[0]: r[1] for r in con.execute(q).fetchall()}


GRAPH = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("d", "e"), ("e", "a"), ("f", "a"),  # f unreachable from a; e cycles back
]


def test_push_three_way_parity(spark):
    expected = _py_push(GRAPH, "a")
    got = _run_engine(spark, GRAPH, "a")
    assert got == pytest.approx(expected, abs=2e-6)
    assert set(got) == set(expected)
    sql = _run_sql(GRAPH, "a")
    assert sql == pytest.approx(expected, abs=2e-6)
    # locality: 'f' is not reachable from the seed -> never touched
    assert "f" not in got


def test_push_dangling_routes_to_seed(spark):
    pairs = [("s", "x"), ("s", "y"), ("x", "s")]  # y is dangling
    expected = _py_push(pairs, "s", eps=1e-7, rounds=200)
    got = _run_engine(spark, pairs, "s", eps=1e-7, max_rounds=200)
    assert got == pytest.approx(expected, abs=2e-6)
    assert _run_sql(pairs, "s", eps=1e-7, rounds=200) == pytest.approx(
        expected, abs=2e-6
    )


def test_push_converges_to_exact_ppr(spark):
    # tight eps: compare against the dense solve of
    # ppr = (1-d) e_seed + d P_aug^T ppr   (teleport-to-seed closure)
    pairs = sorted(set(GRAPH))
    verts = sorted({u for e in pairs for u in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    d = 0.85
    P = np.zeros((n, n))
    outs = defaultdict(list)
    for s, t in pairs:
        outs[s].append(t)
    for v in verts:
        if outs[v]:
            for t in outs[v]:
                P[idx[v], idx[t]] += 1.0 / len(outs[v])
        else:
            P[idx[v], idx["a"]] = 1.0
    e = np.zeros(n)
    e[idx["a"]] = 1.0
    exact = np.linalg.solve(np.eye(n) - d * P.T, (1 - d) * e)
    got = _run_engine(spark, pairs, "a", eps=1e-7, max_rounds=500)
    for v in verts:
        if v == "f":
            continue
        assert got.get(v, 0.0) == pytest.approx(exact[idx[v]], abs=1e-4)


@pytest.mark.parametrize("seed_rng", [5, 23])
def test_push_random_graph_fuzz(spark, seed_rng):
    rng = random.Random(seed_rng)
    verts = [f"v{i}" for i in range(15)]
    pairs = sorted(
        {
            (rng.choice(verts), rng.choice(verts))
            for _ in range(40)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    seed = "v0"
    if not any(seed in e for e in pairs):
        pairs.append((seed, verts[1]))
    expected = _py_push(pairs, seed)
    got = _run_engine(spark, pairs, seed)
    assert got == pytest.approx(expected, abs=2e-6)
    assert _run_sql(pairs, seed) == pytest.approx(expected, abs=2e-6)


def test_push_incremental_matches_cold_after_additions(spark):
    from pagerankproject_spark.graph.pushppr import ppr_push_incremental

    base = sorted(set(GRAPH))
    extra = [("b", "e"), ("a", "f"), ("f", "c")]
    e1 = spark.createDataFrame(base, "src string, dst string")
    g1 = build_graph_tables(spark, e1)
    prev = ppr_push(spark, g1, "a", eps=1e-7, max_rounds=500)

    e2 = spark.createDataFrame(base + extra, "src string, dst string")
    g2 = build_graph_tables(spark, e2)
    inc = {
        r["url"]: r["p"]
        for r in ppr_push_incremental(
            spark, g2, prev, "a", eps=1e-7, max_rounds=500
        ).collect()
    }
    cold = {
        r["url"]: r["p"]
        for r in ppr_push(spark, g2, "a", eps=1e-7, max_rounds=500).collect()
    }
    assert inc == pytest.approx(cold, abs=2e-6)
    assert "f" in inc  # newly reachable mass found by the delta push
    g1.unpersist()
    g2.unpersist()


def test_push_incremental_noop_delta_converges_immediately(spark):
    # same graph again: the invariant residual is rounding dust only,
    # so the warm start returns the previous estimate unchanged
    from pagerankproject_spark.graph.pushppr import ppr_push_incremental

    e1 = spark.createDataFrame(sorted(set(GRAPH)), "src string, dst string")
    g = build_graph_tables(spark, e1)
    prev = ppr_push(spark, g, "a", eps=1e-5, max_rounds=200)
    inc = {
        r["url"]: r["p"]
        for r in ppr_push_incremental(
            spark, g, prev, "a", eps=1e-5, max_rounds=200
        ).collect()
    }
    assert inc == pytest.approx(
        {r["url"]: r["p"] for r in prev.collect()}, abs=2e-5
    )
    g.unpersist()


def test_stream_incremental_ppr_matches_cold(spark, tmp_path):
    from pagerankproject_spark.streaming.events import stream_incremental_ppr

    edges_dir = tmp_path / "ppr_stream"
    edges_dir.mkdir()
    b0 = sorted(set(GRAPH))
    b1 = [("b", "e"), ("a", "f"), ("f", "c")]
    for i, batch in enumerate((b0, b1)):
        (edges_dir / f"batch{i}.csv").write_text(
            "src,dst\n" + "\n".join(f"{s},{d}" for s, d in batch)
        )

    state: dict = {}
    q = stream_incremental_ppr(
        spark, str(edges_dir), state, "a", eps=1e-7, max_rounds=500
    )
    q.awaitTermination(300)
    assert state["batches"] == 2

    got = {r["url"]: r["p"] for r in state["ppr"].collect()}
    cold = _run_engine(spark, b0 + b1, "a", eps=1e-7, max_rounds=500)
    assert got == pytest.approx(cold, abs=2e-6)
    state["g"].unpersist()


def test_push_parquet_index_parity(spark, tmp_path):
    # the bucket-partitioned on-disk index must give the SAME answers
    # as the in-memory form (identical equations; only the physical
    # lookup differs), for cold, multi-seed and incremental pushes
    from pagerankproject_spark.graph.pushppr import (
        build_push_index,
        ppr_push_incremental,
    )

    base = sorted(set(GRAPH))
    edges = spark.createDataFrame(base, "src string, dst string")
    g = build_graph_tables(spark, edges)
    idx = build_push_index(
        spark, g, path=str(tmp_path / "pushidx"), buckets=4
    )
    for seed in ("a", "d"):
        pruned = {
            r["url"]: r["p"]
            for r in ppr_push(spark, g, seed, index=idx).collect()
        }
        mem = {r["url"]: r["p"] for r in ppr_push(spark, g, seed).collect()}
        assert pruned == pytest.approx(mem, abs=2e-6), seed

    prev = ppr_push(spark, g, "a", eps=1e-7, max_rounds=500, index=idx)
    e2 = spark.createDataFrame(
        base + [("b", "e"), ("a", "f")], "src string, dst string"
    )
    g2 = build_graph_tables(spark, e2)
    idx2 = build_push_index(
        spark, g2, path=str(tmp_path / "pushidx2"), buckets=4
    )
    inc = {
        r["url"]: r["p"]
        for r in ppr_push_incremental(
            spark, g2, prev, "a", eps=1e-7, max_rounds=500, index=idx2
        ).collect()
    }
    cold = {
        r["url"]: r["p"]
        for r in ppr_push(spark, g2, "a", eps=1e-7, max_rounds=500).collect()
    }
    assert inc == pytest.approx(cold, abs=2e-6)
    idx2.unpersist()
    g.unpersist()
    g2.unpersist()


def test_push_shared_index_multi_seed(spark):
    # ONE seed-independent index serves every seed (dangling rows are
    # re-aimed at the query's seed at message time)
    from pagerankproject_spark.graph.pushppr import build_push_index

    edges = spark.createDataFrame(sorted(set(GRAPH)), "src string, dst string")
    g = build_graph_tables(spark, edges)
    idx = build_push_index(spark, g)
    for seed in ("a", "c", "d"):
        shared = {
            r["url"]: r["p"]
            for r in ppr_push(spark, g, seed, index=idx).collect()
        }
        owned = {
            r["url"]: r["p"] for r in ppr_push(spark, g, seed).collect()
        }
        assert shared == owned, seed
    idx.unpersist()
    g.unpersist()


def test_push_bad_seed_fails_fast(spark):
    edges = spark.createDataFrame(GRAPH, "src string, dst string")
    g = build_graph_tables(spark, edges)
    with pytest.raises(ValueError, match="seed url not in graph"):
        ppr_push(spark, g, "nope")
    g.unpersist()
