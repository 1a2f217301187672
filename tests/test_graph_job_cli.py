"""graph_job CLI smoke regression: one subprocess per representative
subcommand family (full-GraphTables, lazy raw-edges, weighted-host,
dense-id HyperBall, seeded khop) against the README golden CSV."""

from __future__ import annotations

import gzip
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

SMALL = (
    b"source,target\n1,2\n1,3\n3,1\n3,2\n3,5\n4,5\n4,6\n5,6\n5,4\n6,4\n"
)
HOSTS = (
    b"source,target\nh1.com/a,h2.com/b\nh2.com/b,h1.com/a\n"
    b"h2.com/c,h3.com/x\nh3.com/x,h1.com/d\nh1.com/d,h3.com/y\n"
)


def _run(algo: str, data: Path, *extra: str) -> str:
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "jobs" / "graph_job.py"),
            "--algo", algo, "--data", str(data),
            "--master", "local[4]", "--show", "3", *extra,
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"{algo}: {proc.stderr[-2000:]}"
    return proc.stdout


@pytest.mark.parametrize(
    "algo,extra",
    [
        ("cc", ()),                      # full GraphTables family
        ("reciprocity", ()),             # lazy raw-edges family
        ("khop", ("--source", "3", "--k", "1")),
        ("hyperball", ("--t_max", "8")), # dense-id loop
        ("bowtie", ()),                  # round-3 structure family
        ("salsa", ()),                   # round-3 closed-form family
        ("eigenvector", ()),             # integer power-iteration family
        ("closeness", ("--sources", "1,3")),  # sampled-BFS family
        ("squares", ()),                 # codegree motif family
        ("densest", ()),                 # integer-exact peel family
        ("mis", ()),                     # symmetry-breaking family
        ("coloring", ()),                # symmetry-breaking family
        ("palette", ()),                 # symmetry-breaking family
        ("matching", ()),                # symmetry-breaking family
        ("scan", ("--k", "2")),          # structural-clustering family
        ("pprpush", ("--source", "1")),  # local-push family
        ("leiden", ()),                  # round-4 refinement family
        ("coloringauto", ()),            # round-4 auto-pick default
    ],
)
def test_graph_job_smoke(tmp_path, algo, extra):
    data = tmp_path / "small.csv.gz"
    data.write_bytes(gzip.compress(SMALL))
    out = _run(algo, data, *extra)
    assert "|" in out  # a table printed


def test_graph_job_hostrank(tmp_path):
    data = tmp_path / "hosts.csv.gz"
    data.write_bytes(gzip.compress(HOSTS))
    out = _run("hostrank", data)
    assert "hosts= 3" in out
    assert "converged= True" in out
