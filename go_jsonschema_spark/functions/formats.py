"""String-format predicates (the 19 formats of the reference's
``validateFormat``, /root/reference/validators.go:656-857).

Strategy per SURVEY.md §2.3: formats with a clean regex/native expression
stay JVM-side (``rlike`` / ``to_date`` try-parse); the rest run the parity
interpreter's Python checkers inside ONE Arrow-batched pandas UDF shared by
all such formats (dispatch on a constant, so the Python worker is hit once
per batch regardless of how many format constraints a spec has).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

# JVM-side formats: Java-regex equivalents of the reference's precompiled
# patterns (validators.go:650-654).
_NATIVE_REGEX = {
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    # ISO-8601: weeks form is exclusive — P1Y1W is invalid
    "duration": r"^P(?!$)(?:\d+W|(?=\d|T\d)(?:\d+Y)?(?:\d+M)?(?:\d+D)?(?:T(?=\d)(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?)$",
    "hostname": r"^(?=.{1,253}\.?$)[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*\.?$",
    "json-pointer": r"^(?:/(?:[^~/]|~0|~1)*)*$",
    "relative-json-pointer": r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~/]|~0|~1)*)*)$",
    "date": r"^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$",
}

_PYTHON_FORMATS = frozenset(
    {
        "date-time",
        "time",
        "email",
        "idn-email",
        "idn-hostname",
        "ipv4",
        "ipv6",
        "uri",
        "iri",
        "uri-reference",
        "iri-reference",
        "uri-template",
        "regex",
        "date",  # calendar-exact (leap years) — regex above is the fast pre-filter
    }
)

_batch_checker = None


def _get_batch_checker():
    """One shared pandas UDF ``(value, format) -> bool`` for Python-side
    formats — hoisted module-level so ``re.compile`` work is done once per
    worker (the reference precompiles at parse time, parser.go:181-193)."""
    global _batch_checker
    if _batch_checker is None:
        from go_jsonschema_spark.interp import _FORMAT_CHECKS

        @F.pandas_udf(T.BooleanType())
        def _check(values: pd.Series, fmts: pd.Series) -> pd.Series:
            out = []
            for v, f in zip(values, fmts):
                if v is None:
                    out.append(True)  # NULL handled by type checks
                    continue
                chk = _FORMAT_CHECKS.get(f)
                out.append(True if chk is None else bool(chk(v)))
            return pd.Series(out)

        _batch_checker = _check
    return _batch_checker


def format_predicate(fmt: str, col: Column) -> Column:
    """Boolean predicate: does string ``col`` satisfy format ``fmt``?

    Unknown formats validate as true, matching the reference's default case
    (validators.go:853-856)."""
    if fmt in _NATIVE_REGEX and fmt not in _PYTHON_FORMATS:
        return col.rlike(_NATIVE_REGEX[fmt])
    if fmt in _PYTHON_FORMATS:
        checker = _get_batch_checker()
        pred = checker(col, F.lit(fmt))
        if fmt in _NATIVE_REGEX:
            # cheap JVM regex pre-filter AND exact Python check
            return col.rlike(_NATIVE_REGEX[fmt]) & pred
        return pred
    return F.lit(True)
