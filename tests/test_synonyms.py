"""Corpus-trained distributional synonyms (search/synonyms.py) —
operator #17's gensim-free completion: PPMI vs a pure-python oracle,
semantic sanity of the cosine neighbors, the provider contract, and
the --synonyms_corpus CLI seam end to end."""

from __future__ import annotations

import math
import re
from collections import Counter
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

SMALL_CSV = (
    "source,target\n1,2\n1,3\n3,1\n3,2\n3,5\n4,5\n4,6\n5,6\n5,4\n6,4\n"
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _py_ppmi(texts, window=2, min_count=2):
    pairs = Counter()
    for t in texts:
        toks = t.lower().split()
        for i in range(len(toks)):
            for k in range(1, window + 1):
                if i + k < len(toks):
                    pairs[(toks[i], toks[i + k])] += 1
                    pairs[(toks[i + k], toks[i])] += 1
    nx, ny, n = Counter(), Counter(), 0
    for (x, y), c in pairs.items():
        nx[x] += c
        ny[y] += c
        n += c
    return {
        (x, y): max(0.0, math.log(float(c) * float(n) / (float(nx[x]) * float(ny[y]))))
        for (x, y), c in pairs.items()
        if c >= min_count
    }


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the mat",
    "a cat ran into the house",
    "a dog ran into the house",
    "the cat chased the ball",
    "the dog chased the ball",
    "stocks fell on the news",
    "bonds fell on the news",
]


def test_term_ppmi_matches_python_oracle(spark):
    from pagerankproject_spark.search.synonyms import term_ppmi

    got = {
        (r["x"], r["y"]): (r["n_pairs"], r["ppmi"])
        for r in term_ppmi(_docs(spark, CORPUS)).collect()
    }
    want = _py_ppmi(CORPUS)
    assert set(got) == set(want)
    for key, ppmi in want.items():
        assert got[key][1] == pytest.approx(ppmi, abs=1e-6), key


def test_term_ppmi_window3_matches_python_oracle(spark):
    """window=3 exercises the third slice-zip offset (the generalized
    _offset_pairs path beyond the default window=2)."""
    from pagerankproject_spark.search.synonyms import term_ppmi

    got = {
        (r["x"], r["y"]): r["ppmi"]
        for r in term_ppmi(_docs(spark, CORPUS), window=3).collect()
    }
    want = _py_ppmi(CORPUS, window=3)
    assert set(got) == set(want)
    for key, ppmi in want.items():
        assert got[key] == pytest.approx(ppmi, abs=1e-6), key


def test_fuzz_term_ppmi_random_corpora(spark):
    """Derandomized fuzz (same spirit as test_property_fuzz): random
    tiny corpora over a 6-word vocabulary — repeated words, 1-token
    docs, empty strings — through term_ppmi vs the python oracle."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pagerankproject_spark.search.synonyms import term_ppmi

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    corpus_strategy = st.lists(
        st.lists(st.sampled_from(words), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )

    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=corpus_strategy)
    def check(texts):
        got = {
            (r["x"], r["y"]): (r["n_pairs"], r["ppmi"])
            for r in term_ppmi(_docs(spark, texts), min_count=1).collect()
        }
        want = _py_ppmi(texts, min_count=1)
        assert set(got) == set(want)
        for key, ppmi in want.items():
            assert got[key][1] == pytest.approx(ppmi, abs=1e-6), key

    check()


def test_term_synonyms_cat_dog_are_mutual_neighbors(spark):
    """cat and dog share every context (sat/ran/chased frames) while
    stocks/bonds live in a different frame — distributional cosine must
    rank cat<->dog as each other's top neighbor and keep the finance
    terms out of their top slot."""
    from pagerankproject_spark.search.synonyms import term_synonyms

    rows = term_synonyms(
        _docs(spark, CORPUS), probes=["cat", "dog", "stocks"], k=3,
        min_count=1,
    ).collect()
    top = {
        r["term"]: r["neighbor"] for r in rows if r["rank"] == 1
    }
    assert top["cat"] == "dog"
    assert top["dog"] == "cat"
    assert top["stocks"] == "bonds"
    for r in rows:
        assert 0.0 <= r["cosine"] <= 1.0 + 1e-9


def test_term_synonyms_int_probes_deterministic(spark):
    from pagerankproject_spark.search.synonyms import term_synonyms

    a = term_synonyms(_docs(spark, CORPUS), probes=3, k=2, min_count=1)
    b = term_synonyms(_docs(spark, CORPUS), probes=3, k=2, min_count=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # 'the' is the most frequent token, so it must be among the probes
    assert "the" in {r["term"] for r in a.collect()}


def test_term_synonyms_context_df_cap_matches_duckdb(spark):
    """max_context_df drops hub contexts BEFORE norms and dots in both
    engines: the capped Spark run must match the capped DuckDB twin
    row-for-row, and capping must actually remove at least one context
    on this corpus (so the test exercises the filter, not a no-op)."""
    import duckdb

    from pagerankproject_spark.search.synonyms import (
        sql_term_synonyms,
        term_synonyms,
    )

    con = duckdb.connect()
    con.execute("create table documents (text varchar)")
    con.executemany(
        "insert into documents values (?)", [(t,) for t in CORPUS]
    )
    got = sorted(
        (r["term"], r["neighbor"], r["cosine"], r["rank"])
        for r in term_synonyms(
            _docs(spark, CORPUS), probes=5, k=3, min_count=1,
            max_context_df=4,
        ).collect()
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                sql_term_synonyms(
                    probes=5, k=3, min_count=1, max_context_df=4
                )
            ).fetchall(),
        )
    )
    assert got == want
    uncapped = sorted(
        map(
            tuple,
            con.execute(
                sql_term_synonyms(probes=5, k=3, min_count=1)
            ).fetchall(),
        )
    )
    assert uncapped != want  # the cap bit on this corpus


def test_corpus_synonyms_provider_contract(spark):
    """Same provider shape as file_synonyms: best-first (score desc,
    neighbor asc), unknown/absent term -> [], case-insensitive terms."""
    from pagerankproject_spark.search.synonyms import corpus_synonyms

    prov = corpus_synonyms(
        spark, _docs(spark, CORPUS), ["CAT", "zzz-unknown"], top_k=2,
        min_count=1,
    )
    cat = prov("cat")
    assert cat and cat[0][0] == "dog"
    assert cat == prov("CAT")  # case-insensitive lookup
    assert [s for _, s in cat] == sorted(
        [s for _, s in cat], reverse=True
    )
    assert len(cat) <= 2
    assert prov("zzz-unknown") == []
    assert prov("never-requested") == []


def test_cli_synonyms_corpus(tmp_path):
    """--synonyms_corpus end to end: train on a corpus where 'page'
    co-occurs with the token '4'; the expanded predicate must then
    match url '4' even though no url contains 'page'."""
    import gzip
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    data = tmp_path / "small.csv.gz"
    data.write_bytes(gzip.compress(SMALL_CSV.encode()))
    corpus = tmp_path / "corpus.parquet"
    pq.write_table(
        pa.table({"text": ["page 4 page 4 page 4", "other words here"]}),
        corpus,
    )

    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "pagerank_job.py"),
            f"--data={data}",
            "--search_query=page",
            f"--synonyms_corpus={corpus}",
            "--master", "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    ranked = re.findall(r"rank = \d+ ranking = ([0-9.e+-]+) url= (\S+)", out)
    assert [url for _, url in ranked] == ["4"], out[-2000:]


def test_stream_incremental_ppmi_matches_batch(spark, tmp_path):
    """After the stream drains, the maintained PPMI equals the batch
    term_ppmi on the full prefix, and the maintained pair-count table
    equals the exact python pair counter — the same stream == batch
    contract as the heavy-hitter/HLL/CM twins."""
    from collections import Counter

    from pagerankproject_spark.search.synonyms import term_ppmi
    from pagerankproject_spark.streaming.events import (
        stream_incremental_ppmi,
    )

    docs_dir = tmp_path / "syn_docs"
    docs_dir.mkdir()
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batches = [
        [(0, "the cat sat on the mat", "en", "s", 22),
         (1, "the dog sat on the mat", "en", "s", 22)],
        [(2, "a cat ran into the house", "en", "s", 24)],
        [(3, "stocks fell on the news", "en", "s", 23),
         (4, "bonds fell on the news", "en", "s", 22)],
    ]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(
            str(docs_dir / f"f{i}")
        )

    state: dict = {}
    q = stream_incremental_ppmi(spark, str(docs_dir) + "/*", state)
    q.awaitTermination(300)
    assert state["batches"] == 3

    all_texts = [r[1] for b in batches for r in b]
    got = {
        (r["x"], r["y"]): (r["n_pairs"], r["ppmi"])
        for r in state["ppmi"].collect()
    }
    want = {
        (r["x"], r["y"]): (r["n_pairs"], r["ppmi"])
        for r in term_ppmi(_docs(spark, all_texts)).collect()
    }
    assert got == want and len(got) > 0

    # the maintained count table is the exact corpus pair counter
    pairs = Counter()
    for t in all_texts:
        toks = t.split()
        for i in range(len(toks)):
            for k in (1, 2):
                if i + k < len(toks):
                    pairs[(toks[i], toks[i + k])] += 1
                    pairs[(toks[i + k], toks[i])] += 1
    got_counts = {
        (r["x"], r["y"]): r["n_pairs"]
        for r in state["pair_counts"].collect()
    }
    assert got_counts == dict(pairs)


def test_cli_text_job_synonyms(tmp_path):
    """text_job --op synonyms end to end: writes (term, neighbor,
    cosine, rank) parquet for the query's terms, ranks 1..top_k
    best-first."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    out_dir = tmp_path / "syn_out"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "text_job.py"),
            "--documents", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(out_dir),
            "--op", "synonyms",
            "--query", "data group",
            "--top_k", "3",
            "--master", "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-4000:]
    t = pq.read_table(out_dir).to_pylist()
    assert sorted(set(r["term"] for r in t)) == ["data", "group"]
    for term in ("data", "group"):
        rows = sorted(
            (r for r in t if r["term"] == term), key=lambda r: r["rank"]
        )
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        scores = [r["cosine"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_cli_synonym_flags_mutually_exclusive(tmp_path):
    import gzip
    import subprocess
    import sys

    data = tmp_path / "small.csv.gz"
    data.write_bytes(gzip.compress(SMALL_CSV.encode()))
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "pagerank_job.py"),
            f"--data={data}",
            "--synonyms_file=x.json",
            "--synonyms_corpus=y.parquet",
        ],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=str(REPO),
    )
    assert proc.returncode != 0
    assert "mutually exclusive" in (proc.stdout + proc.stderr)
