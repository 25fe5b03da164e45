"""Jinja-lite model compilation (reference §2.9 O2).

dbt renders ``{{ ref('x') }}`` / ``{{ source('s','t') }}`` /
``{{ config(...) }}`` into plain SQL (reference: every model under
dbt/models/, e.g. dbt/models/marts/orders.sql:35-47). We implement the
three constructs the reference exercises with a small regex renderer —
no template engine needed, and the dependency graph falls out of the same
scan.
"""

from __future__ import annotations

import re

_REF_RE = re.compile(r"\{\{\s*ref\(\s*['\"]([\w.]+)['\"]\s*\)\s*\}\}")
_SOURCE_RE = re.compile(
    r"\{\{\s*source\(\s*['\"]([\w.]+)['\"]\s*,\s*['\"]([\w.]+)['\"]\s*\)\s*\}\}"
)
_CONFIG_RE = re.compile(r"\{\{\s*config\((.*?)\)\s*\}\}", re.DOTALL)
_CONFIG_KV_RE = re.compile(r"(\w+)\s*=\s*['\"]?([\w.]+)['\"]?")
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_INCR_BLOCK_RE = re.compile(
    r"\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}", re.DOTALL
)


def extract_deps(sql: str) -> tuple[list[str], list[tuple[str, str]]]:
    """(ref names, (source group, table) pairs) appearing in a model."""
    refs = _REF_RE.findall(sql)
    sources = [(g, t) for g, t in _SOURCE_RE.findall(sql)]
    return refs, sources


def extract_config(sql: str) -> dict[str, str]:
    """In-model ``{{ config(materialized='table') }}`` overrides."""
    m = _CONFIG_RE.search(sql)
    if not m:
        return {}
    return dict(_CONFIG_KV_RE.findall(m.group(1)))


def render(
    sql: str,
    resolve_ref,
    resolve_source,
    this: str | None = None,
    is_incremental: bool = False,
) -> str:
    """Render a model body to executable Spark SQL.

    ``resolve_ref(name) -> str`` and ``resolve_source(group, table) -> str``
    return the physical relation identifier (view/table name) — the
    equivalent of dbt's ref/source resolution through
    generate_schema_name (reference dbt/macros/generate_schema_name.sql).

    Incremental constructs (dbt core surface beyond the reference):
    ``{% if is_incremental() %}...{% endif %}`` blocks are kept on
    incremental runs and dropped on first/full-refresh runs; ``{{ this }}``
    resolves to the model's own target relation.
    """
    out = _CONFIG_RE.sub("", sql)
    out = _INCR_BLOCK_RE.sub(lambda m: m.group(1) if is_incremental else "", out)
    if this is not None:
        out = _THIS_RE.sub(this, out)
    out = _REF_RE.sub(lambda m: resolve_ref(m.group(1)), out)
    out = _SOURCE_RE.sub(lambda m: resolve_source(m.group(1), m.group(2)), out)
    return out.strip().rstrip(";")
