"""North-rule deployment surface: `spark-submit --py-files pkg.zip
main.py ...` — the library ships as a zip, the driver script runs from
a scratch cwd (nothing importable except via --py-files), exactly the
shape a multi-executor cluster submission takes."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.mark.slow
def test_spark_submit_py_files_e2e(tmp_path, tiny_path):
    zip_path = str(tmp_path / "hikma_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "hikma_engine_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, REPO))

    out = str(tmp_path / "kg_submit")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    res = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "main.py"),
            "index", "--transcripts", tiny_path, "--out", out,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # scratch cwd: the zip is the only package source
        env=env,
        timeout=360,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    assert payload["stats"]["node_types"]["Conversation"] == 2  # tiny corpus
    assert os.path.exists(os.path.join(out, "nodes", "_SUCCESS"))
    assert os.path.exists(os.path.join(out, "edges", "_SUCCESS"))
    # python doesn't accidentally resolve the package from the repo —
    # the subprocess cwd contains no hikma_engine_spark
    assert not os.path.exists(os.path.join(str(tmp_path), "hikma_engine_spark"))
