"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """Column reference by EXACT name — backtick-quoted so dots, spaces
    and other specials in raw CSV headers (e.g. ``Design No.``) are not
    parsed as nested-field access."""
    return F.col("`" + name.replace("`", "``") + "`")
