"""Month-name determinism under a NON-ENGLISH host locale (SURVEY §7
hard-part 5): the month-normalization ops use date_format('MMMM'),
which must produce English names on any JVM — the reference's data
carries English month strings ("JUNE", "Apr-22") and the DuckDB
oracles restate them in English.

Runs the real month path in a SUBPROCESS whose JVM defaults to fr_FR
(JAVA_TOOL_OPTIONS) — in-process monkeypatching can't change an
already-launched JVM's default locale.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from kaggle_ecommerce_etl_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("locale-test", master="local[2]")
loc = spark._jvm.java.util.Locale.getDefault().toString()
df = spark.createDataFrame(
    [("2024-01-15",), ("2024-06-01",)], "d string"
).select(F.date_format(F.col("d").cast("date"), "MMMM").alias("m"))
months = sorted(r["m"] for r in df.collect())
print("LOCALE=" + loc)
print("MONTHS=" + ",".join(months))
"""


def test_month_names_english_under_french_jvm():
    env = dict(os.environ)
    env["JAVA_TOOL_OPTIONS"] = "-Duser.language=fr -Duser.country=FR"
    # whichever layer wins (session.py's extraJavaOptions pin, or
    # Spark's internal Locale.US in TimestampFormatter), the
    # OBSERVABLE contract is the same: English month names
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = dict(
        l.split("=", 1) for l in out.stdout.splitlines() if "=" in l
    )
    # English months even though the JVM-default locale landed non-en-US
    assert lines["MONTHS"] == "January,June", lines
