"""Jinja-lite model compilation (reference §2.9 O2).

dbt renders ``{{ ref('x') }}`` / ``{{ source('s','t') }}`` /
``{{ config(...) }}`` into plain SQL (reference: every model under
dbt/models/, e.g. dbt/models/marts/orders.sql:35-47). We implement the
three constructs the reference exercises with a small regex renderer —
no template engine needed, and the dependency graph falls out of the same
scan.

Macros (the package surface, reference dbt/packages.yml:2-3): ``{% macro
name(a, b='x') %}...{% endmacro %}`` definitions from a project's or
package's ``macros/*.sql``, called as ``{{ name(expr, b='y') }}``.
Expansion is textual and happens BEFORE ref/source resolution, so macro
bodies may use ``{{ ref(...) }}``/``{{ source(...) }}`` and the model DAG
still falls out of the expanded text. Argument values are raw SQL
fragments; one level of surrounding quotes is stripped so ``'col_name'``
arrives as ``col_name`` (dbt string-arg convention). Nested parentheses
inside call arguments are supported; nested macro calls expand
iteratively (depth-capped).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# ref('m') | ref('m', v=2) | ref('m', version=2) — the optional version
# pin resolves to the concrete versioned node <m>_v<N> (dbt model
# versions; files are named <model>_v<N>.sql by convention)
_REF_RE = re.compile(
    r"\{\{\s*ref\(\s*['\"]([\w.]+)['\"]"
    r"(?:\s*,\s*(?:v|version)\s*=\s*(\d+))?\s*\)\s*\}\}"
)


def _ref_name(name: str, version: str | None) -> str:
    return f"{name}_v{version}" if version else name
_SOURCE_RE = re.compile(
    r"\{\{\s*source\(\s*['\"]([\w.]+)['\"]\s*,\s*['\"]([\w.]+)['\"]\s*\)\s*\}\}"
)
_CONFIG_RE = re.compile(r"\{\{\s*config\((.*?)\)\s*\}\}", re.DOTALL)
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_INCR_BLOCK_RE = re.compile(
    r"\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}", re.DOTALL
)


_MACRO_DEF_RE = re.compile(
    r"\{%-?\s*macro\s+(\w+)\s*\(([^)]*)\)\s*-?%\}(.*?)\{%-?\s*endmacro\s*-?%\}",
    re.DOTALL,
)


@dataclass
class Macro:
    name: str
    params: list[tuple[str, str | None]]  # (name, default or None)
    body: str


def extract_macros(text: str) -> dict[str, Macro]:
    """Parse ``{% macro ... %}`` definitions from a macros/*.sql file."""
    out: dict[str, Macro] = {}
    for name, params_src, body in _MACRO_DEF_RE.findall(text):
        params: list[tuple[str, str | None]] = []
        for p in _split_args(params_src):
            if "=" in p:
                pname, default = p.split("=", 1)
                params.append((pname.strip(), _unquote(default.strip())))
            elif p.strip():
                params.append((p.strip(), None))
        out[name] = Macro(name, params, body.strip())
    return out


_TEST_DEF_RE = re.compile(
    r"\{%-?\s*test\s+(\w+)\s*\(([^)]*)\)\s*-?%\}(.*?)\{%-?\s*endtest\s*-?%\}",
    re.DOTALL,
)


def extract_sql_tests(text: str) -> dict[str, Macro]:
    """Parse dbt SQL GENERIC TESTS — ``{% test name(model, column_name)
    %} SELECT failing rows... {% endtest %}`` — from tests/generic/*.sql.
    Same Jinja-lite surface as macros; the body is a SELECT returning
    failing rows, rendered with the bound model/column (and any extra
    kwargs) then executed by TestRunner."""
    out: dict[str, Macro] = {}
    for name, params_src, body in _TEST_DEF_RE.findall(text):
        params: list[tuple[str, str | None]] = []
        for p in _split_args(params_src):
            if "=" in p:
                pname, default = p.split("=", 1)
                params.append((pname.strip(), _unquote(default.strip())))
            elif p.strip():
                params.append((p.strip(), None))
        out[name] = Macro(name, params, body.strip())
    return out


def _split_args(src: str) -> list[str]:
    """Split a call-argument list on top-level commas (quotes and nested
    parens respected)."""
    args, depth, buf, quote = [], 0, [], None
    for ch in src:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        args.append("".join(buf))
    return [a.strip() for a in args]


def _unquote(v: str) -> str:
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]
    return v


def expand_macros(sql: str, macros: dict[str, Macro], max_depth: int = 10) -> str:
    """Expand ``{{ macro_name(args) }}`` calls textually; iterates so
    macros may call other macros (depth-capped against recursion)."""
    if not macros:
        return sql
    names = "|".join(re.escape(n) for n in macros)
    call_re = re.compile(r"\{\{\s*(" + names + r")\s*\(((?:[^{}])*?)\)\s*\}\}")

    def repl(m: re.Match) -> str:
        macro = macros[m.group(1)]
        given = _split_args(m.group(2))
        bound: dict[str, str] = {
            p: d for p, d in macro.params if d is not None
        }
        pos = 0
        for a in given:
            kv = re.match(r"^(\w+)\s*=\s*(.+)$", a, re.DOTALL)
            if kv and any(p == kv.group(1) for p, _ in macro.params):
                bound[kv.group(1)] = _unquote(kv.group(2).strip())
            else:
                if pos >= len(macro.params):
                    raise ValueError(
                        f"macro {macro.name!r}: too many positional args"
                    )
                bound[macro.params[pos][0]] = _unquote(a)
                pos += 1
        missing = [p for p, _ in macro.params if p not in bound]
        if missing:
            raise ValueError(f"macro {macro.name!r}: missing args {missing}")
        body = macro.body
        # 1. plain `{{ param }}` regions become the raw bound text
        for p, _ in macro.params:
            body = re.sub(
                r"\{\{\s*" + re.escape(p) + r"\s*\}\}", lambda _m, p=p: bound[p], body
            )
        # 2. params used as bare identifiers inside OTHER `{{ ... }}`
        # expressions (e.g. a nested macro call `{{ other(param) }}`) bind
        # too — Jinja evaluates them as variables there; raw SQL text
        # outside braces is never touched, and neither are quoted string
        # literals inside the braces ({{ other('col') }} stays literal even
        # for a param named col) — both matching Jinja
        def _sub_region(m2: re.Match) -> str:
            # odd split indices are quoted spans — left untouched
            segs = re.split(r"('[^']*'|\"[^\"]*\")", m2.group(1))
            for i in range(0, len(segs), 2):
                for p, _ in macro.params:
                    segs[i] = re.sub(
                        r"\b" + re.escape(p) + r"\b",
                        lambda _m, p=p: bound[p],
                        segs[i],
                    )
            return "{{" + "".join(segs) + "}}"

        return re.sub(r"\{\{(.*?)\}\}", _sub_region, body, flags=re.DOTALL)

    for _ in range(max_depth):
        new = call_re.sub(repl, sql)
        if new == sql:
            if call_re.search(new):  # self-reproducing call: m() -> m()
                break
            return new
        sql = new
    raise ValueError("macro expansion did not converge (recursive macros?)")


def extract_deps(sql: str) -> tuple[list[str], list[tuple[str, str]]]:
    """(ref names, (source group, table) pairs) appearing in a model."""
    refs = [_ref_name(n, v) for n, v in _REF_RE.findall(sql)]
    sources = [(g, t) for g, t in _SOURCE_RE.findall(sql)]
    return refs, sources


def extract_config(sql: str) -> dict[str, str]:
    """In-model ``{{ config(materialized='table') }}`` overrides. Values
    may be quoted strings containing commas/colons/parens (contracts,
    hook SQL) — parsed with the same quote/paren-aware tokenizer as
    macro arguments."""
    m = _CONFIG_RE.search(sql)
    if not m:
        return {}
    out: dict[str, str] = {}
    for part in _split_args(m.group(1)):
        if "=" in part:
            k, v = part.split("=", 1)
            out[k.strip()] = _unquote(v.strip())
    return out


_VAR_RE = re.compile(
    r"\{\{\s*var\(\s*(['\"])(\w+)\1\s*(?:,\s*(.+?))?\)\s*\}\}", re.DOTALL
)


def _var_text(v) -> str:
    if v is None:
        # a var set to null in YAML renders as SQL NULL, not the Python
        # repr text "None"
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    return str(v)


def substitute_vars(sql: str, variables: dict) -> str:
    """Resolve ``{{ var('name') }}`` / ``{{ var('name', default) }}``
    (dbt vars: project.yml ``vars:`` block overridden by CLI ``--vars``).
    The raw value is inserted — templates quote string vars themselves,
    matching dbt."""

    def repl(m: re.Match) -> str:
        name, default = m.group(2), m.group(3)
        if name in variables:
            return _var_text(variables[name])
        if default is not None:
            return _unquote(default.strip())
        raise ValueError(f"var {name!r} is not defined and has no default")

    return _VAR_RE.sub(repl, sql)


def render(
    sql: str,
    resolve_ref,
    resolve_source,
    this: str | None = None,
    is_incremental: bool = False,
    variables: dict | None = None,
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
    out = substitute_vars(sql, variables or {})
    out = _CONFIG_RE.sub("", out)
    out = _INCR_BLOCK_RE.sub(lambda m: m.group(1) if is_incremental else "", out)
    if this is not None:
        out = _THIS_RE.sub(this, out)
    out = _REF_RE.sub(
        lambda m: resolve_ref(_ref_name(m.group(1), m.group(2))), out
    )
    out = _SOURCE_RE.sub(lambda m: resolve_source(m.group(1), m.group(2)), out)
    return out.strip().rstrip(";")
