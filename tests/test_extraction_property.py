"""Property-based spec test: for ANY text, the engine's vectorized
scanner and the independent pure-Python oracle agree on the gazetteer/
at/toolcall match sets. Catches regex-vs-scanner drift that example-
based tests miss."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hikma_engine_spark import extraction
from hikma_engine_spark.extraction import (
    KIND_AT,
    KIND_GAZETTEER,
    KIND_TOOLCALL,
)

import oracle_kg

# text built from fragments likely to hit every rule + boundary traps
_FRAGMENTS = st.sampled_from(
    [
        "postgresql", "postgres", "pgsql", "k8s", "apache spark", "spark",
        "PostgreSQL", "PYTHON", "py3", "js", "xjs", "jsx", "pythonic",
        "@alice", "@Bob-2", "@x", "@", "call:linter", "call:sql_runner",
        "call:X", "recall:linter", "depends on", "python depends on redis",
        " ", ", ", ". ", "\n", "-", "_", "7", "word", "the", "@@tool",
        "redis depends on  python", "a@alice", "no entities here",
    ]
)
texts = st.lists(_FRAGMENTS, min_size=0, max_size=12).map("".join)


def _engine_matches(text: str):
    return {
        (start, end, kind, norm)
        for start, end, _s, norm, kind, _o, _f in extraction._postprocess_turn(
            extraction._scan_text(text)
        )
        if kind in (KIND_GAZETTEER, KIND_AT, KIND_TOOLCALL)
    }


def _oracle_matches(text: str):
    gaz = oracle_kg._gaz_matches(text)
    gaz_spans = {(s, e) for s, e, _ in gaz}
    out = {(s, e, KIND_GAZETTEER, surf.lower()) for s, e, surf in gaz}
    out |= {
        (s, e, KIND_AT, surf.lower())
        for s, e, surf in oracle_kg._at_matches(text)
        if (s, e) not in gaz_spans
    }
    out |= {
        (s, e, KIND_TOOLCALL, surf.lower())
        for s, e, surf in oracle_kg._tool_matches(text)
    }
    return out


@settings(max_examples=300, deadline=None)
@given(texts)
def test_scanner_matches_oracle_on_arbitrary_text(text):
    assert _engine_matches(text) == _oracle_matches(text)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_scanner_never_crashes_and_spans_are_valid(text):
    for start, end, surface, norm, kind, _obj, _f in extraction._postprocess_turn(
        extraction._scan_text(text)
    ):
        assert 0 <= start < end <= len(text)
        if kind in (KIND_GAZETTEER,):
            assert text[start:end].lower() == norm
