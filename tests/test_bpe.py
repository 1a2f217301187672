"""BPE merge training: engine vs a pure-python replay AND the DuckDB
chained-CTE twin, including the overlap (l == r) run-alternation case.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pagerankproject_spark.text.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_merges,
    sql_bpe_merges,
)


# ---------------------------------------------------------------------------
# pure-python reference (Sennrich 2016 semantics)
# ---------------------------------------------------------------------------

def _py_merge(syms: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(texts: list[str], k: int, min_count: int = 2):
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    vocab = {w: (list(w) + [END_OF_WORD], f) for w, f in freqs.items()}
    rules = []
    for rank in range(k):
        pc: dict[tuple[str, str], int] = {}
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        rules.append((rank, left, right, cnt))
        vocab = {
            w: (_py_merge(syms, left, right), f)
            for w, (syms, f) in vocab.items()
        }
    return rules, vocab


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _run_sql(texts, k, min_count=2):
    con = duckdb.connect()
    con.execute("create table documents(text varchar)")
    con.executemany("insert into documents values (?)", [(t,) for t in texts])
    q = sql_bpe_merges("documents", num_merges=k, min_count=min_count)
    return [
        (int(r[0]), r[1], r[2], int(r[3]))
        for r in con.execute(q).fetchall()
    ]


CORPUS = [
    "the cat sat on the mat",
    "the cats sat",
    "low lower lowest",
    "low low low newer newer wider",
]


def test_bpe_three_way_parity(spark):
    k = 10
    expected, _ = _py_bpe(CORPUS, k)
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in bpe_merges(_docs(spark, CORPUS), num_merges=k)
            .orderBy("rank").collect()
    ]
    assert got == expected
    assert _run_sql(CORPUS, k) == expected


def test_bpe_overlap_run_alternation(spark):
    # 'aaaa' exercises l == r: greedy merges positions (0,1) and (2,3)
    texts = ["aaaa aaaa aaa", "aaaa zz zz"]
    k = 4
    expected, _ = _py_bpe(texts, k, min_count=1)
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in bpe_merges(_docs(spark, texts), num_merges=k, min_count=1)
            .orderBy("rank").collect()
    ]
    assert got == expected
    assert ("a", "a") in [(l, r) for _, l, r, _ in expected]
    assert _run_sql(texts, k, min_count=1) == expected


def test_bpe_early_stop_and_sql_gate_agree(spark):
    # every word unique -> all pair counts 1 < min_count=2: zero merges
    texts = ["q w e r t y"]
    got = bpe_merges(_docs(spark, texts), num_merges=5).collect()
    assert got == []
    assert _run_sql(texts, 5) == []


def test_bpe_encode_matches_python_replay(spark):
    k = 8
    rules, vocab = _py_bpe(CORPUS, k)
    merges = [(l, r) for _, l, r, _ in rules]
    got = {
        r["word"]: (list(r["subwords"]), r["freq"])
        for r in bpe_encode(_docs(spark, CORPUS), merges).collect()
    }
    expected = {w: (syms, f) for w, (syms, f) in vocab.items()}
    assert got == expected


def test_cli_text_job_bpe(tmp_path):
    """text_job --op bpe end to end: writes the ordered merge table."""
    import subprocess
    import sys
    from pathlib import Path

    import pyarrow.parquet as pq

    repo = Path(__file__).resolve().parents[1]
    out_dir = tmp_path / "bpe_out"
    proc = subprocess.run(
        [
            sys.executable, str(repo / "jobs" / "text_job.py"),
            "--documents", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(out_dir),
            "--op", "bpe", "--merges", "6",
            "--master", "local[4]",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(repo),
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    t = sorted(pq.read_table(out_dir).to_pylist(), key=lambda r: r["rank"])
    assert [r["rank"] for r in t] == list(range(len(t))) and len(t) == 6
    assert all(r["freq"] >= 2 for r in t)
    assert all((r["left"] + r["right"]).count("</w>") <= 1 for r in t)


@pytest.mark.parametrize("seed", [7, 41])
def test_bpe_random_corpus_fuzz(spark, seed):
    rng = random.Random(seed)
    alphabet = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 12))
        )
        for _ in range(25)
    ]
    k = 6
    expected, _ = _py_bpe(texts, k)
    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in bpe_merges(_docs(spark, texts), num_merges=k)
            .orderBy("rank").collect()
    ]
    assert got == expected
    assert _run_sql(texts, k) == expected
