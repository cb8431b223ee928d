"""The shared rule-driven normalization pass (SURVEY.md §2f op 37's
inner ``transform()``, reference ecommerce_s3_to_pg.py:123-214).

Two-phase execution, made explicit:

1. **Profile** — ONE aggregation job over the already NA-canonicalized
   frame computes every data-dependent gate (numeric parse rate per
   string column, any-date per month column, per-column null counts).
2. **Plan** — emit a single lazy projection applying, per column:
   - name contains ``date``  → tolerant parse → ISO ``yyyy-MM-dd`` string
   - name contains ``month`` → month-name normalization (datetime branch
     iff any value parses, else 3-letter-prefix branch)  [pg.py:157-169]
   - ≥90% numeric-parseable  → noise-strip + double cast + round(2)
     [pg.py:175-184]
   - remaining string cols   → trim                      [pg.py:190-192]
   then drop all-null columns [pg.py:202-204].

The emitted plan is pure Column expressions — Catalyst fuses the whole
thing into one codegen stage over the scan; only the profile job reads
the data twice, and it is a single pass with map-side partial aggs.
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
from kaggle_ecommerce_etl_spark.normalize.profile import column_profile, drop_all_null_columns
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
    for c in string_cols:
        name = c.lower()
        if "date" in name:
            exprs[c] = date_to_iso(qcol(c))
        elif "month" in name:
            if prof[c]["date_any"]:
                exprs[c] = normalize_month_expr_datetime(qcol(c))
            else:
                exprs[c] = normalize_month_expr_prefix(qcol(c))
        elif (
            n_rows > 0
            and prof[c]["numeric_rate"] is not None
            and prof[c]["numeric_rate"] > numeric_gate
        ):
            exprs[c] = tolerant_numeric(qcol(c))
        else:
            exprs[c] = F.trim(qcol(c))
    out = df.withColumns(exprs) if exprs else df
    # NA tokens may reappear as '' after trim → canonicalize once more
    out = canonicalize_na(out)
    # null counts change after coercion (failed parses → NULL): recount
    return drop_all_null_columns(out)
