"""Deterministic entity vocabulary: gazetteer, alias clusters, tools.

This is the engine's world knowledge, shared by the synthetic corpus
generator (synth.py), the extraction stage, and the entity-linking
oracle in tests. Alias clusters exist so that entity linking +
connected-components canonicalization is actually exercised
(FIXTURES.md §1): multiple surface forms must collapse to one canonical
node id.

The canonical form of a cluster is its first (longest, most formal)
surface. Everything is lowercase-normalized for matching.
"""

from __future__ import annotations

import re

# canonical surface -> all alias surfaces (including the canonical one).
# Clusters are chosen so that some aliases are MinHash-similar to their
# canonical form (postgresql/postgres) and some are NOT (k8s/kubernetes)
# — the latter exercise the explicit alias-map path of the linker while
# the former exercise the similarity path.
ALIAS_CLUSTERS: dict[str, list[str]] = {
    "postgresql": ["postgresql", "postgres", "pgsql"],
    "kubernetes": ["kubernetes", "k8s", "kube"],
    "javascript": ["javascript", "ecmascript", "js"],
    "typescript": ["typescript", "ts-lang"],
    "python": ["python", "cpython", "py3"],
    "apache spark": ["apache spark", "pyspark", "sparksql"],
    "apache kafka": ["apache kafka", "kafka"],
    "apache iceberg": ["apache iceberg", "iceberg"],
    "tensorflow": ["tensorflow", "tflow"],
    "react": ["react", "reactjs"],
    "docker": ["docker", "dockerd"],
    "redis": ["redis"],
    "elasticsearch": ["elasticsearch", "elastic search"],
    "graphql": ["graphql"],
    "terraform": ["terraform"],
    "airflow": ["airflow", "apache airflow"],
    "snowflake": ["snowflake"],
    "duckdb": ["duckdb"],
    "parquet": ["parquet"],
    "arrow": ["arrow", "apache arrow"],
}

# hot entities (appear in a large share of turns — skew driver, FIXTURES.md §1)
HOT_ENTITIES = ["python", "apache spark"]

TOOLS = ["search", "browser", "calculator", "sql_runner", "shell", "editor", "linter"]

ROLES = ["user", "assistant", "system", "tool"]


def surface_to_canonical() -> dict[str, str]:
    """alias surface (lowercase) -> canonical surface."""
    out: dict[str, str] = {}
    for canon, aliases in ALIAS_CLUSTERS.items():
        for a in aliases:
            out[a] = canon
    return out


def all_surfaces() -> list[str]:
    """Every gazetteer surface, longest-first (so the regex alternation
    prefers 'apache spark' over 'spark')."""
    s = {a for aliases in ALIAS_CLUSTERS.values() for a in aliases}
    return sorted(s, key=lambda x: (-len(x), x))


def gazetteer_pattern(capture: bool = True) -> str:
    """Case-insensitive whole-word alternation over all surfaces."""
    alts = "|".join(re.escape(s) for s in all_surfaces())
    group = "(" if capture else "(?:"
    return r"(?<![A-Za-z0-9_])" + group + alts + r")(?![A-Za-z0-9_])"


AT_MENTION_PATTERN = r"@([A-Za-z][A-Za-z0-9_\-]{1,30})"
TOOL_CALL_PATTERN = r"(?<![A-Za-z0-9_])call:([a-z][a-z0-9_\-]{1,30})"
# SVO relation rule: "<gazetteer surface> depends on <gazetteer surface>"
DEPENDS_ON_TEMPLATE = r"({g})\s+depends\s+on\s+({g})"
