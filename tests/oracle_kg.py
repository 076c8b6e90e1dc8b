"""Independent pure-Python oracle for the extraction/linking spec.

Deliberately implemented WITHOUT reusing hikma_engine_spark.extraction's
regexes or code paths — plain positional scanning loops over the same
published spec (extraction.py docstring), so that a bug in the engine's
vectorized implementation cannot hide in a shared helper. This is the
golden-triple-set generator for the P/R ≥ 0.95 gate (BASELINE.md).

Spec being implemented (same wording as extraction.py):
  R1 gazetteer mentions — vocab surfaces, case-insensitive, whole word
     (no [A-Za-z0-9_] adjacent), longest surface wins at a position,
     non-overlapping left-to-right
  R2 @-mentions — @name, name = [A-Za-z][A-Za-z0-9_-]{1,30}
  R3 tool calls — call:<tool>, tool = [a-z][a-z0-9_-]{1,30}
  R4 depends-on — "<surface> depends on <surface>" (whitespace-separated)
plus the structural/triple assembly rules and the gazetteer alias map
for SAME_AS.
"""

from __future__ import annotations

import pandas as pd

from hikma_engine_spark.vocab import ALIAS_CLUSTERS

_WORD = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")
_SURFACES = sorted(
    {a for aliases in ALIAS_CLUSTERS.values() for a in aliases},
    key=lambda s: (-len(s), s),
)
_ALIAS_TO_CANON = {a: c for c, aliases in ALIAS_CLUSTERS.items() for a in aliases}


def _is_boundary(text: str, i: int) -> bool:
    return i < 0 or i >= len(text) or text[i] not in _WORD


def _gaz_matches(text: str) -> list[tuple[int, int, str]]:
    """Longest-preferred, non-overlapping, left-to-right gazetteer scan."""
    out = []
    i, n = 0, len(text)
    low = text.lower()
    while i < n:
        hit = None
        if _is_boundary(text, i - 1):
            for s in _SURFACES:
                j = i + len(s)
                if low.startswith(s, i) and _is_boundary(text, j):
                    hit = (i, j, text[i:j])
                    break
        if hit:
            out.append(hit)
            i = hit[1]
        else:
            i += 1
    return out


def _at_matches(text: str) -> list[tuple[int, int, str]]:
    out = []
    i, n = 0, len(text)
    while i < n:
        if text[i] == "@" and i + 1 < n and text[i + 1].isalpha():
            j = i + 1
            while (
                j < n
                and (text[j].isalnum() or text[j] in "_-")
                and (j - (i + 1)) < 31
            ):
                j += 1
            if j - (i + 1) >= 2:
                out.append((i + 1, j, text[i + 1 : j]))
                i = j
                continue
        i += 1
    return out


def _tool_matches(text: str) -> list[tuple[int, int, str]]:
    out = []
    marker = "call:"
    start = 0
    while True:
        k = text.find(marker, start)
        if k < 0:
            break
        if not _is_boundary(text, k - 1):
            start = k + 1
            continue
        i = k + len(marker)
        if i < len(text) and text[i].islower():
            j = i + 1
            while (
                j < len(text)
                and (text[j].islower() or text[j].isdigit() or text[j] in "_-")
                and (j - i) < 31
            ):
                j += 1
            if j - i >= 2:
                out.append((i, j, text[i:j]))
                start = j
                continue
        start = k + 1
    return out


def _depends_matches(text: str) -> list[tuple[str, str]]:
    """(subj_norm, obj_norm) for '<surface> depends on <surface>'."""
    import re as _re

    out = []
    low = text.lower()
    for m in _re.finditer(r"\bdepends\s+on\s+", low):
        # subject: a gazetteer surface ending right before the whitespace
        # preceding 'depends'
        subj_end = m.start()
        while subj_end > 0 and low[subj_end - 1].isspace():
            subj_end -= 1
        subj = None
        for s in _SURFACES:
            b = subj_end - len(s)
            if b >= 0 and low[b:subj_end] == s and _is_boundary(text, b - 1):
                subj = s
                break
        obj = None
        o_start = m.end()
        for s in _SURFACES:
            if low.startswith(s, o_start) and _is_boundary(text, o_start + len(s)):
                obj = s
                break
        if subj and obj:
            out.append((subj, obj))
    return out


def golden_triples(transcripts: pd.DataFrame) -> set[tuple[str, str, str]]:
    """The expected (src, edge_type, dst) set for a transcript corpus."""
    triples: set[tuple[str, str, str]] = set()
    observed_surfaces: set[str] = set()
    for row in transcripts.itertuples(index=False):
        conv, idx = row.conv_id, int(row.turn_idx)
        text = row.text if isinstance(row.text, str) else ""
        turn = f"turn:{conv}#{idx}"
        triples.add((turn, "IN_CONV", f"conv:{conv}"))

        gaz = _gaz_matches(text)
        gaz_spans = {(s, e) for s, e, _ in gaz}
        # spec: an @-mention whose exact span is also a gazetteer match
        # is dropped (the gazetteer reading wins)
        ats = [m for m in _at_matches(text) if (m[0], m[1]) not in gaz_spans]
        ent_mentions = gaz + ats
        for start, _end, surf in ent_mentions:
            norm = surf.lower()
            observed_surfaces.add(norm)
            mention = f"mention:{conv}#{idx}#{start}"
            triples.add((mention, "IN_TURN", turn))
            triples.add((mention, "REFERS_TO", f"entity:{norm}"))
            triples.add((turn, "MENTIONS", f"entity:{norm}"))

        for _s, _e, tool in _tool_matches(text):
            triples.add((turn, "INVOKES", f"tool:{tool.lower()}"))
        if row.role == "tool" and isinstance(row.tool, str) and row.tool:
            triples.add((turn, "INVOKES", f"tool:{row.tool.lower()}"))

        for subj, obj in _depends_matches(text):
            triples.add((f"entity:{subj}", "DEPENDS_ON", f"entity:{obj}"))

    # SAME_AS from the gazetteer alias map (observed surfaces only)
    for s in observed_surfaces:
        canon = _ALIAS_TO_CANON.get(s)
        if canon and canon != s:
            triples.add((f"entity:{s}", "SAME_AS", f"entity:{canon}"))
    return triples


def expected_canonical(surfaces: set[str]) -> dict[str, str]:
    """surface → canonical per the alias map (identity if unknown)."""
    return {s: _ALIAS_TO_CANON.get(s, s) for s in surfaces}
