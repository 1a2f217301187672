"""North-rule submission path: the engine runs under real
`spark-submit --py-files engine.zip` with the job script copied OUTSIDE
the repo, so the zip is the only source of `pagerankproject_spark`.
Asserts the reference goldens (README.md:444-449) on the small graph.
"""

from __future__ import annotations

import gzip
import re
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

SMALL_CSV = (
    "source,target\n1,2\n1,3\n3,1\n3,2\n3,5\n4,5\n4,6\n5,6\n5,4\n6,4\n"
)
# /root/reference/README.md:444-449 (4 significant digits)
GOLDEN = {"4": 0.6627, "6": 0.52179, "5": 0.41434, "2": 0.23175, "3": 0.1859, "1": 0.16917}


@pytest.mark.skipif(
    not Path(SPARK_SUBMIT).exists(), reason="spark-submit not on this host"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    from tools.make_pyfiles_zip import build_zip

    zip_path = build_zip(tmp_path / "engine.zip")
    job = tmp_path / "pagerank_job.py"
    shutil.copy(REPO / "jobs" / "pagerank_job.py", job)
    data = tmp_path / "small.csv.gz"
    data.write_bytes(gzip.compress(SMALL_CSV.encode()))

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zip_path),
            str(job),
            f"--data={data}",
            "--verbose",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # not the repo: only the zip provides the engine
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]

    got = {
        url: float(val)
        for val, url in re.findall(r"ranking = ([0-9.e+-]+) url= (\S+)", out)
    }
    assert set(got) == set(GOLDEN), out[-2000:]
    for url, want in GOLDEN.items():
        assert abs(got[url] - want) < 1e-4, (url, got[url], want)
    # 24 iterations i=0..23 (README.md:420-443)
    assert re.search(r"i=23 residual=", out), out[-2000:]


def test_cli_search_with_synonyms_file(tmp_path):
    """--synonyms_file end to end: the reference's --search_query flow
    with a file-backed stand-in for the gensim top-5 expansion
    (pagerank.py:259-269). score counts ONLY the expanded neighbors
    (s^45 weighting), so url '4' (neighbor score 0.9) must outrank
    url '5' (0.5) despite both matching the predicate."""
    import gzip
    import json
    import subprocess
    import sys

    data = tmp_path / "small.csv.gz"
    data.write_bytes(gzip.compress(SMALL_CSV.encode()))
    syn = tmp_path / "syn.json"
    syn.write_text(json.dumps({"page": [["4", 0.9], ["5", 0.5]]}))

    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "jobs" / "pagerank_job.py"),
            f"--data={data}",
            "--search_query=page",
            f"--synonyms_file={syn}",
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
    # predicate keeps only urls containing 'page', '4', or '5'
    assert [url for _, url in ranked] == ["4", "5"]
    # ranking = pagerank * occurrences * s^45
    assert float(ranked[0][0]) == pytest.approx(GOLDEN["4"] * 0.9**45, rel=1e-3)
    assert float(ranked[1][0]) == pytest.approx(GOLDEN["5"] * 0.5**45, rel=1e-3)
