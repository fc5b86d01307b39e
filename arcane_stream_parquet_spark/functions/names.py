"""Column-name normalization (reference: P2 in SURVEY.md §2.2).

The reference strips special characters (``$``, ``/``, ``\\``, …) from
every source field name before any other rule sees it, and all
field-referencing config uses the normalized names
(reference docs/crd.md:186-188, 221-224). We normalize to
``[0-9a-zA-Z_]`` — a pure metadata operation (``toDF`` rename), zero
cost at any scale: Catalyst rewrites the plan, no data is touched.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NORMALIZE_RE = re.compile(r"[^0-9a-zA-Z_]")


def normalize_name(name: str) -> str:
    """Strip every character outside ``[0-9a-zA-Z_]`` from a field name."""
    return _NORMALIZE_RE.sub("", name)


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Rename every column to its normalized form.

    Raises if two distinct source names collapse to the same normalized
    name — silent data loss otherwise (the reference leaves this case
    undefined; we fail fast).
    """
    normalized = [normalize_name(c) for c in df.columns]
    if len(set(normalized)) != len(normalized):
        dupes = sorted({n for n in normalized if normalized.count(n) > 1})
        raise ValueError(f"name normalization collides on: {dupes}")
    if normalized == list(df.columns):
        return df
    return df.toDF(*normalized)
