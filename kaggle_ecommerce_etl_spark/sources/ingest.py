"""External-dataset ingestion utility (SURVEY.md §2a op 2; reference
ecommerce_raw_to_s3.py:44-113).

Reference behavior re-expressed:

1. fetch + unpack the Kaggle dataset (s3.py:70) — network step,
   injectable here (`fetch_fn`) and gated behind an import-try on the
   ``kaggle`` package, which does not exist in this environment;
2. filter the landed files: ``'sale' in name.lower()``, ``.csv``
   suffix, no ``'%20'`` in the name (s3.py:74-78);
3. read each with the UTF-8 → ISO-8859-1 encoding fallback
   (s3.py:95-99) and re-serialize as clean UTF-8 headered CSV under a
   timestamped name ``<stem>_<ts>.csv`` (s3.py:86, 102-110).

This is an out-of-engine utility (driver script shape, SURVEY §3 EP2):
per-file single-object outputs mirror the reference's S3 puts. The
re-encode itself runs through Spark so a huge raw file still streams
through executors rather than driver memory.
"""

from __future__ import annotations

import datetime as _dt
import os
from collections.abc import Callable

from pyspark.sql import SparkSession

from kaggle_ecommerce_etl_spark.sinks.csv_sink import timestamped_name, write_csv_file
from kaggle_ecommerce_etl_spark.sources.csv_source import (
    read_csv_with_encoding_fallback,
)


def sale_csv_filter(name: str) -> bool:
    """The reference's landing filter (s3.py:74-78): sale-report CSVs
    only, skipping URL-mangled duplicate names."""
    return "sale" in name.lower() and name.endswith(".csv") and "%20" not in name


def fetch_kaggle_dataset(dataset: str, dest_dir: str) -> None:
    """Download+unzip a Kaggle dataset (reference s3.py:70). Requires
    the ``kaggle`` package + API credentials — absent in this
    environment, so callers inject ``fetch_fn`` instead (tests drop
    files straight into ``src_dir``)."""
    try:
        import kaggle  # noqa: F401
    except ImportError as e:  # pragma: no cover — package not installed here
        raise NotImplementedError(
            "kaggle package not available; pass fetch_fn or pre-stage files"
        ) from e
    kaggle.api.authenticate()  # pragma: no cover
    kaggle.api.dataset_download_files(dataset, path=dest_dir, unzip=True)  # pragma: no cover


def ingest_raw_files(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    fetch_fn: Callable[[str], None] | None = None,
    name_filter: Callable[[str], bool] = sale_csv_filter,
    now: _dt.datetime | None = None,
) -> list[str]:
    """Land external raw files into the engine's drop directory
    (op 2): optional fetch → name filter → encoding-fallback read →
    UTF-8 re-serialize under ``<stem>_<ts>.csv``. Returns written
    paths, sorted for determinism."""
    if fetch_fn is not None:
        fetch_fn(src_dir)
    os.makedirs(dest_dir, exist_ok=True)
    written: list[str] = []
    for name in sorted(os.listdir(src_dir)):
        if not name_filter(name):
            continue
        df = read_csv_with_encoding_fallback(spark, os.path.join(src_dir, name))
        out_name = timestamped_name(name[: -len(".csv")], now) + ".csv"
        out_path = os.path.join(dest_dir, out_name)
        write_csv_file(df, out_path)
        written.append(out_path)
    return written
