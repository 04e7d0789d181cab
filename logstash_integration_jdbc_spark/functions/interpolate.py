"""Parameter schemes: field reference, %{...} interpolation, constant.

The reference extracts lookup-join keys from events three ways
(/root/reference/lib/logstash/plugin_mixins/jdbc_streaming/parameter_handler.rb:4-63,
/root/reference/lib/logstash/filters/jdbc/lookup.rb:11-37,183-193,
docs/filter-jdbc_streaming.asciidoc "3 possible parameter schemes"):

1. **field reference** — ``"ip"`` / ``"[a][b]"`` → ``event.get``;
2. **interpolation** — ``"%{[a]}-suffix"`` / ``"%%{[ip]}"`` →
   ``event.sprintf`` (the latter builds a LIKE pattern,
   spec/filters/jdbc_static_spec.rb:23-25);
3. **constant** — any non-string value.

Here each scheme compiles to a Catalyst ``Column`` — the join key is an
expression, evaluated vectorized inside whole-stage codegen, never a
per-row Python call.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_REF_RE = re.compile(r"%\{([^}]+)\}")
# Classification twin of the reference's index('%{')/index('}') probe
# (parameter_handler.rb:26): unlike _REF_RE it accepts the degenerate
# empty ref "%{}" so classify_bind_value matches the reference bit-level
# on malformed inputs (interpolate_expr still substitutes nothing there).
_REF_ANY_RE = re.compile(r"%\{[^}]*\}")


def field_ref(ref: str) -> Column:
    """``[a][b]`` / ``a`` → ``col("a.b")`` (nested fields via dots)."""
    parts = re.findall(r"\[([^\]]+)\]", ref)
    if not parts:
        parts = [ref]
    col = F.col(parts[0])
    for p in parts[1:]:
        col = col.getField(p)
    return col


def sprintf_expr(template: str) -> Column:
    """``"%%{[ip]}"`` → ``concat(lit("%"), col("ip"))`` etc.

    Literal segments stay literals; every ``%{ref}`` becomes the field
    cast to string (matching event.sprintf's stringification).
    """
    pieces: list[Column] = []
    pos = 0
    for m in _REF_RE.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        pieces.append(field_ref(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    if not pieces:
        return F.lit("")
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)


def classify_bind_value(value: Any) -> str:
    """Prepared-statement bind-value scheme → 'interpolated' | 'field' |
    'constant', mirroring ``build_bind_value_handler``
    (parameter_handler.rb:19-34): non-strings are constants, ``%{...}``
    is interpolated, strings that are entirely square-bracket refs
    (``"[a]"``, ``"[a][b]"``, whitespace-separated) are field refs, any
    other string is a constant."""
    if not isinstance(value, str):
        return "constant"
    if _REF_ANY_RE.search(value):
        return "interpolated"
    if re.fullmatch(r"(\s*\[[^\]]+\]\s*)*", value):
        return "field"
    return "constant"


def warn_on_string_constants(bind_values: list[Any] | tuple[Any, ...]) -> list[str]:
    """The reference's constant-usage nicety
    (jdbc_streaming.rb:95,188-194, default-on
    ``prepared_statement_warn_on_constant_usage``): a bare string bind
    value like ``"ip"`` is treated as a CONSTANT, not the field named
    ip — an easy silent misconfiguration. Returns the warnable string
    constants (empty = nothing logged) and logs one warning naming them
    with the reference's wording."""
    warnables = [v for v in bind_values
                 if isinstance(v, str) and classify_bind_value(v) == "constant"]
    if warnables:
        import logging

        logging.getLogger(__name__).warning(
            "When using prepared statements, the following "
            "`prepared_statement_bind_values` will be treated as constants, "
            "if you intend them to be field references please use the square "
            "bracket field reference syntax e.g. '[field]': %s", warnables)
    return warnables


def param_expr(value: Any) -> tuple[Column, Column | None]:
    """Compile one parameter scheme.

    Returns ``(key_expr, invalid_expr)`` where ``invalid_expr`` is a
    boolean Column that is true when the reference would declare the
    parameter invalid (field missing from the event,
    parameter_handler.rb:30-38 — a null value in columnar terms), or
    ``None`` for constants (never invalid).
    """
    if not isinstance(value, str):
        return F.lit(value), None
    if _REF_RE.search(value):
        expr = sprintf_expr(value)
        # sprintf on a missing field renders the ref text in Logstash;
        # for join keys a null component means the key is unusable —
        # treat any null referenced field as invalid.
        refs = [field_ref(r) for r in _REF_RE.findall(value)]
        invalid = None
        for r in refs:
            invalid = r.isNull() if invalid is None else (invalid | r.isNull())
        return expr, invalid
    col = field_ref(value)
    return col, col.isNull()
