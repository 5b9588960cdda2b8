"""ECMA-262 regex routing for the typed compiler.

JSON Schema ``pattern`` is ECMA-262 dialect; Spark's ``rlike`` is
``java.util.regex``.  The dialects agree on the overwhelmingly common
subset, so the typed compiler keeps ``rlike`` (JVM-side, codegen) as the
default — but some ECMA patterns are Java *compile errors* (named groups
with underscores, Annex-B literal braces, ...).  The reference translates a
known-construct list (/root/reference/helpers.go:69-86); we detect the gap
precisely instead: test-compile the pattern with ``java.util.regex`` via
the active session's JVM, and only patterns Java rejects are routed to an
Arrow-batched pandas UDF running the interpreter's ECMA shim
(interp.compile_ecma_regex — ``\\cX`` control escapes + ``(?<name>`` →
``(?P<name>`` translation).

The routed predicate is a documented slow path: one pattern per UDF, batch
evaluation, regex compiled once per worker — never per row.

Dialect classes (``\\w \\W \\d \\D \\s \\S \\b \\B``) compile in BOTH
dialects but diverge on non-ASCII input: ``java.util.regex`` evaluates
them ASCII-only by default, while ECMA-facing engines are Unicode-aware —
the reference rewrites them to Unicode classes before compiling
(``\\w``→``\\pL`` etc., /root/reference/helpers.go:69-86), and the
interpreter's Python ``re`` shim is Unicode-aware natively.  Because the
rewrite costs the JVM-native ``rlike`` fast path, routing patterns that
merely CONTAIN these classes through the shim is opt-in:
``set_unicode_class_routing(True)`` (or env
``GJS_UNICODE_REGEX_CLASSES=1``).  Off by default, the divergence matches
the reference's own documented ecmascript-regex skip surface
(validate_test.go:261-263); on, ``café`` matches ``^\\w+$`` exactly as
the reference's converted pattern does.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

__all__ = ["java_regex_ok", "ecma_rlike", "ecma_pattern_predicate",
           "has_dialect_classes", "set_unicode_class_routing"]

_JAVA_OK_CACHE: dict[str, bool] = {}

_UNICODE_CLASS_ROUTING = (
    os.environ.get("GJS_UNICODE_REGEX_CLASSES", "0") == "1")


def set_unicode_class_routing(enabled: bool) -> None:
    """Route patterns containing dialect classes (``\\w``/``\\d``/…)
    through the Unicode-aware ECMA shim even when Java would accept them.
    Costs the native ``rlike`` fast path for those patterns only."""
    global _UNICODE_CLASS_ROUTING
    _UNICODE_CLASS_ROUTING = bool(enabled)


def has_dialect_classes(pattern: str) -> bool:
    """True if ``pattern`` contains a ``\\w \\W \\d \\D \\s \\S \\b \\B``
    escape TOKEN (a literal ``\\\\w`` — escaped backslash then ``w`` — is
    not one), the classes the two dialects evaluate differently on
    non-ASCII input."""
    i, n = 0, len(pattern)
    while i < n - 1:
        if pattern[i] == "\\":
            if pattern[i + 1] in "wWdDsSbB":
                return True
            i += 2  # consume the escape pair (incl. an escaped backslash)
        else:
            i += 1
    return False


def java_regex_ok(pattern: str) -> bool:
    """True if ``java.util.regex`` accepts ``pattern`` (so ``rlike`` can run
    it).  Uses the active session's JVM; with no JVM up, falls back to a
    static screen for the constructs Java is known to reject."""
    hit = _JAVA_OK_CACHE.get(pattern)
    if hit is not None:
        return hit
    ok = None
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None and getattr(s, "_jvm", None) is not None:
            try:
                s._jvm.java.util.regex.Pattern.compile(pattern)
                ok = True
            except Exception:
                ok = False
    except Exception:  # pragma: no cover - connect-mode etc.
        ok = None
    if ok is None:
        # static screen: Java group names are [A-Za-z][A-Za-z0-9]* — ECMA
        # allows _/$/unicode; Annex-B lone braces are Java "Illegal
        # repetition"
        import re as _re

        bad = (
            _re.search(r"\(\?<(?![=!])(?![A-Za-z][A-Za-z0-9]*>)", pattern)
            or _re.search(r"\{(?!\d+(,\d*)?\})", pattern)
        )
        ok = not bad
    _JAVA_OK_CACHE[pattern] = ok
    return ok


def ecma_rlike(col: Column, pattern: str) -> Column:
    """ECMA-dialect ``rlike``: Arrow-batched pandas UDF over the
    interpreter's translated+cached regex.  Patterns the shim cannot
    compile at all validate as True (the reference skips those cases too,
    validate_test.go:261-263)."""

    @F.pandas_udf(T.BooleanType())
    def _match(s: pd.Series) -> pd.Series:
        from go_jsonschema_spark.interp import compile_ecma_regex

        rx = compile_ecma_regex(pattern)
        if rx is None:
            return pd.Series([True] * len(s), dtype=object)
        return s.map(lambda v: None if v is None else bool(rx.search(v)))

    return _match(col)


def ecma_pattern_predicate(col: Column, pattern: str) -> Column:
    """``pattern`` keyword predicate with dialect routing: native ``rlike``
    when Java accepts the pattern, the ECMA batch UDF otherwise.  With
    :func:`set_unicode_class_routing` on, patterns containing dialect
    classes (``\\w``/``\\d``/``\\s``/``\\b`` …) also take the shim so
    non-ASCII input is classified the way the reference's converted
    patterns classify it (helpers.go:69-86)."""
    if _UNICODE_CLASS_ROUTING and has_dialect_classes(pattern):
        return ecma_rlike(col, pattern)
    if java_regex_ok(pattern):
        return col.rlike(pattern)
    return ecma_rlike(col, pattern)
