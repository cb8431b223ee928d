"""The shared rule-driven normalization pass (SURVEY.md §2f op 37's
inner ``transform()``, reference ecommerce_s3_to_pg.py:123-214).

Two-phase execution, made explicit:

1. **Profile** — ONE aggregation job over the already NA-canonicalized
   frame computes every data-dependent gate: per-branch success counts
   (numeric / date / month-prefix) and per-column null counts.
2. **Plan** — emit a single lazy projection applying, per column:
   - name contains ``date``  → tolerant parse → ISO ``yyyy-MM-dd`` string
   - name contains ``month`` → month-name normalization (datetime branch
     iff any value parses, else 3-letter-prefix branch)  [pg.py:157-169]
   - ≥90% numeric-parseable  → noise-strip + double cast + round(2)
     [pg.py:175-184]
   - remaining string cols   → trim                      [pg.py:190-192]
   then drop all-null columns [pg.py:202-204] — decided from the SAME
   profile (each branch's success count IS its post-coercion non-null
   count), so no second scan.

The emitted plan is pure Column expressions — Catalyst fuses it into
one codegen stage over the scan; total data reads: profile scan + the
consumer's execution. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kaggle_ecommerce_etl_spark.normalize.columns import normalize_column_names
from kaggle_ecommerce_etl_spark.normalize.casts import (
    date_to_iso,
    normalize_month_expr_datetime,
    normalize_month_expr_prefix,
    tolerant_numeric,
)
from kaggle_ecommerce_etl_spark.normalize.profile import column_profile
from kaggle_ecommerce_etl_spark.normalize.tokens import canonicalize_na
from kaggle_ecommerce_etl_spark.util import qcol

NUMERIC_GATE = 0.9  # reference: converted.notna().sum() > 0.9*len(df)


def transform(df: DataFrame, numeric_gate: float = NUMERIC_GATE) -> DataFrame:
    """Rule-driven cleanup of a raw all-string frame (see module doc)."""
    df = normalize_column_names(df)
    df = canonicalize_na(df)

    string_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    prof = column_profile(df, string_cols)
    n_rows = prof["__rows__"]

    exprs: dict[str, F.Column] = {}
    nonnull_after: dict[str, int] = {}
    for c in df.columns:
        info = prof[c]
        if c not in string_cols:
            nonnull_after[c] = n_rows - info["nulls"]
            continue
        role = info["role"]
        if role == "date":
            exprs[c] = date_to_iso(qcol(c))
            nonnull_after[c] = info["date_ok"]
        elif role == "month":
            if info["date_ok"]:
                exprs[c] = normalize_month_expr_datetime(qcol(c))
                nonnull_after[c] = info["date_ok"]
            else:
                exprs[c] = normalize_month_expr_prefix(qcol(c))
                nonnull_after[c] = info["prefix_ok"]
        elif n_rows > 0 and info["numeric_ok"] is not None and (
            info["numeric_ok"] / n_rows > numeric_gate
        ):
            exprs[c] = tolerant_numeric(qcol(c))
            nonnull_after[c] = info["numeric_ok"]
        else:
            # trim never creates new NULLs (NA tokens already collapsed)
            exprs[c] = F.trim(qcol(c))
            nonnull_after[c] = n_rows - info["nulls"]

    out = df.withColumns(exprs) if exprs else df
    out = canonicalize_na(out)
    dead = [c for c in out.columns if nonnull_after.get(c, 1) == 0]
    return out.drop(*dead) if dead else out
