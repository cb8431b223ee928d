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
from kaggle_ecommerce_etl_spark.normalize.tokens import na_token_to_null
from kaggle_ecommerce_etl_spark.util import qcol

NUMERIC_GATE = 0.9  # reference: converted.notna().sum() > 0.9*len(df)


def transform(df: DataFrame, numeric_gate: float = NUMERIC_GATE) -> DataFrame:
    """Rule-driven cleanup of a raw all-string frame (see module doc).

    Emits ONE ``select`` projection (not layered withColumns passes):
    the coercion branches null out NA tokens inherently ('' / 'NA' fail
    every parse), and the keep-branch composes trim + NA-canonicalize
    at the expression level. A flat projection keeps Catalyst analysis
    cost linear in columns — layered projections made plan compilation
    the dominant cost for wide frames.
    """
    df = normalize_column_names(df)

    string_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    prof = column_profile(df, string_cols)
    n_rows = prof["__rows__"]

    select_exprs = []
    nonnull_after: dict[str, int] = {}
    for c in df.columns:
        info = prof[c]
        if c not in string_cols:
            select_exprs.append(qcol(c))
            nonnull_after[c] = n_rows - info["nulls"]
            continue
        role = info["role"]
        if role == "date":
            expr = date_to_iso(qcol(c))
            nonnull_after[c] = info["date_ok"]
        elif role == "month":
            if info["date_ok"]:
                expr = normalize_month_expr_datetime(qcol(c))
                nonnull_after[c] = info["date_ok"]
            else:
                expr = normalize_month_expr_prefix(qcol(c))
                nonnull_after[c] = info["prefix_ok"]
        elif n_rows > 0 and info["numeric_ok"] is not None and (
            info["numeric_ok"] / n_rows > numeric_gate
        ):
            expr = tolerant_numeric(qcol(c))
            nonnull_after[c] = info["numeric_ok"]
        else:
            expr = na_token_to_null(F.trim(qcol(c)))
            nonnull_after[c] = info["keep_ok"]
        select_exprs.append(expr.alias(c))

    out = df.select(*select_exprs)
    dead = [c for c in out.columns if nonnull_after.get(c, 1) == 0]
    return out.drop(*dead) if dead else out
