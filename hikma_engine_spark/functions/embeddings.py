"""Deterministic hash embeddings (Arrow-batched pandas UDF).

Mirrors the reference's hash-fallback embedding
(src/modules/embedding-service.ts:259-282: char-code hash scaled to
[-1,1]) as the deterministic test/bench embedding; a real model would
drop into the same iterator-of-series UDF shape (model loaded once per
executor python worker — the Spark analog of the reference's persistent
Python sidecar, src/modules/embedding-py.ts:59-97).

Spec (shared with the pure-Python test oracle):
  tokens  = lowercase [a-z0-9]+ runs of the text
  for each token: d = md5(token); bucket = d[:4] % DIM; sign from d[4]&1
  vec[bucket] += sign; then L2-normalize (zero vector stays zero).
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EMBEDDING_DIM

_TOKEN_RE = re.compile(r"[a-z0-9]+")


@lru_cache(maxsize=1 << 16)
def _token_feature(token: str, dim: int) -> tuple[int, float]:
    d = hashlib.md5(token.encode("utf-8")).digest()
    bucket = int.from_bytes(d[:4], "big") % dim
    sign = 1.0 if d[4] & 1 else -1.0
    return bucket, sign


def embed_text(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Single-text embedding (driver-side use: query embedding)."""
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        for tok in _TOKEN_RE.findall(text.lower()):
            b, s = _token_feature(tok, dim)
            vec[b] += s
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def _embed_series(texts: pd.Series, dim: int = EMBEDDING_DIM) -> pd.Series:
    """Batch embedding: one flat scatter-add over the whole Arrow batch
    (tokenize per row, then np.add.at on a (rows × dim) matrix) — no
    per-row vector construction."""
    n = len(texts)
    mat = np.zeros((n, dim), dtype=np.float64)
    toks_per_row = texts.fillna("").str.lower().str.findall(_TOKEN_RE)
    counts = toks_per_row.str.len().to_numpy(dtype=np.int64)
    if counts.sum() > 0:
        flat = [t for row in toks_per_row for t in row]
        row_idx = np.repeat(np.arange(n), counts)
        # hash each DISTINCT token once (factorize = C-speed dedup),
        # then fancy-index — ~30% faster than per-occurrence lookups
        codes, uniques = pd.factorize(pd.Series(flat, dtype=object))
        feats_u = np.array(
            [_token_feature(t, dim) for t in uniques], dtype=np.float64
        )
        feats = feats_u[codes]
        np.add.at(mat, (row_idx, feats[:, 0].astype(np.int64)), feats[:, 1])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = (mat / norms[:, None]).astype(np.float32)
    return pd.Series(list(mat), index=texts.index)


# worker-global model slot: populated at most once per python worker
# PROCESS (not per task, not per batch). With spark.python.worker.reuse
# (default on) a long-lived worker serves many tasks off one init —
# the Spark analog of the reference's persistent Python sidecar
# (src/modules/embedding-py.ts:59-97: one process, many embed calls).
_MODEL_SLOT: dict = {}


def _load_model():
    """Return the embedding callable, initializing it once per worker
    process. The deterministic hash embedder stands in for a real
    encoder; a sentence-transformer drops in by replacing the returned
    callable here — the iterator-UDF shape around it is already the
    one a heavyweight model needs. ``init_count`` exists so tests can
    pin the once-per-process contract."""
    if "model" not in _MODEL_SLOT:
        _MODEL_SLOT["init_count"] = _MODEL_SLOT.get("init_count", 0) + 1
        _MODEL_SLOT["model"] = _embed_series
    return _MODEL_SLOT["model"]


def _embed_batches(batches):
    """Iterator-of-series body of embed_udf (plain generator, unit-
    testable without a SparkSession): resolve the model ONCE, then
    stream Arrow batches through it."""
    model = _load_model()
    for texts in batches:
        yield model(texts)


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Vectorized (Arrow-batched) embedding column: string →
    array<float>, in the iterator-of-series form (the type hints select
    SQL_SCALAR_PANDAS_ITER_UDF) so per-task setup (model resolution)
    happens once per task and per-process setup (model LOAD) once per
    worker — not once per batch."""
    yield from _embed_batches(texts)


def with_embedding(df, text_col: str = "source_text", out_col: str = "embedding"):
    return df.withColumn(out_col, embed_udf(F.col(text_col)))


def embed_tokens(tokens: list[str], dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Embedding over an explicit token list (e.g. character shingles —
    used by entity linking so near-spellings get high cosine)."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in tokens:
        b, s = _token_feature(tok, dim)
        vec[b] += s
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_tokens_udf(token_arrays: pd.Series) -> pd.Series:
    """array<string> → array<float> (Arrow-batched shingle embedding)."""
    return token_arrays.map(
        lambda arr: embed_tokens(list(arr) if arr is not None else [])
    )
