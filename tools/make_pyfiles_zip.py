"""Package the engine for `spark-submit --py-files` (north rule submission
path): zip `pagerankproject_spark/` so a job script can run from anywhere
with the engine supplied via the zip, exactly as on a real cluster.

Usage: python tools/make_pyfiles_zip.py [out.zip]   (default dist/engine.zip)
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build_zip(out: Path) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "pagerankproject_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "engine.zip"
    print(build_zip(dest))
