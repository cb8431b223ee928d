"""File-type classification / routing (SURVEY.md §2f op 36; reference
ecommerce_s3_to_pg.py:704-722).

Driver-side dispatch on the file key: amazon+sale → amazon pipeline,
international+sale → international, sale alone → sale, else skip."""

from __future__ import annotations


def classify_file(key: str) -> str | None:
    """Return pipeline name for an input file key, or None to skip."""
    k = key.lower()
    if "sale" not in k:
        return None
    if "amazon" in k:
        return "amazon"
    if "international" in k:
        return "international"
    return "sale"
