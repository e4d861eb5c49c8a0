"""Package the engine for ``spark-submit --py-files`` (the north-rule
launch shape): zip the ``json_spark`` package so executors can import it
with no install step.

    python tools/make_pyfiles.py [out.zip]     # default dist/json_spark.zip
    spark-submit --py-files dist/json_spark.zip run_suite.py --clips ... --out ...

The zip holds the package AT THE ARCHIVE ROOT (json_spark/...), which is
what PYTHONPATH-style --py-files resolution expects. __pycache__ and
.pyc are excluded so the artifact is deterministic across runs.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "json_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "json_spark.zip")
    print(build(out))
