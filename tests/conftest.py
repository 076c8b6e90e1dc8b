"""Shared fixtures: one SparkSession per test run; synthetic corpora."""

from __future__ import annotations

import os
import shutil
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hikma_engine_spark import synth  # noqa: E402
from hikma_engine_spark.pipeline import Pipeline  # noqa: E402
from hikma_engine_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hikma_tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def corpus_path() -> str:
    return synth.ensure_corpus(n_convs=120, seed=42)


@pytest.fixture(scope="session")
def corpus_pdf(corpus_path) -> pd.DataFrame:
    return pd.read_parquet(corpus_path)


@pytest.fixture(scope="session")
def pipeline_out(spark, corpus_path, tmp_path_factory):
    """Full pipeline run (session-scoped — reused across read-only tests)."""
    out = str(tmp_path_factory.mktemp("kg_out"))
    p = Pipeline(spark, corpus_path, out)
    p.run()
    return p


# tiny hand-written corpus with exactly known mentions/triples
TINY_ROWS = [
    # conv_id, turn_idx, role, text, tool, ts
    ("c1", 0, "user", "I prefer PostgreSQL over redis.", None, "2025-01-01T00:00:00"),
    ("c1", 1, "assistant", "postgres depends on python internally? No.", None, "2025-01-01T00:00:05"),
    ("c1", 2, "tool", "tool result: 3 docs about k8s.", "search", "2025-01-01T00:00:09"),
    ("c2", 0, "user", "@alice please call:linter the JS file.", None, "2025-01-02T00:00:00"),
    ("c2", 1, "assistant", "Done. No entities here.", None, "2025-01-02T00:00:07"),
]


@pytest.fixture(scope="session")
def tiny_path(tmp_path_factory) -> str:
    pdf = pd.DataFrame(
        TINY_ROWS, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    path = str(tmp_path_factory.mktemp("tiny") / "transcripts.parquet")
    pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    return path


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_path):
    return spark.read.parquet(tiny_path)


def rm(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: end-to-end tests that launch subprocesses (spark-submit)"
    )
