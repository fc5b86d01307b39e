"""Field-selection rule engine (reference: P1, SURVEY.md §2.2).

The reference projects columns by rule ``all | include{fields} |
exclude{fields}`` with a set of *essential fields* (default
``[createdon, arcane_merge_key]``) that can never be dropped
(crd-parquet-stream.yaml:394-441, docs/crd.md:184-200). Field names in
the rule refer to NORMALIZED names.

Spark realization: a plain ``df.select`` — Catalyst turns it into
parquet column pruning (the reference's ``isServerSide=true`` "push the
selection into the source read" is therefore the only behavior we have;
verified via ReadSchema in the physical plan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from arcane_stream_parquet_spark.functions.keys import (
    MERGE_KEY_COLUMN,
    VERSION_COLUMN,
)
from arcane_stream_parquet_spark.functions.names import normalize_name

DEFAULT_ESSENTIAL_FIELDS = (VERSION_COLUMN, MERGE_KEY_COLUMN)

_VALID_MODES = ("all", "include", "exclude")


@dataclass(frozen=True)
class FieldSelectionRule:
    """``mode`` ∈ {all, include, exclude}; ``fields`` are normalized names."""

    mode: str = "all"
    fields: frozenset[str] = field(default_factory=frozenset)
    essential_fields: tuple[str, ...] = DEFAULT_ESSENTIAL_FIELDS

    def __post_init__(self) -> None:
        if self.mode not in _VALID_MODES:
            raise ValueError(f"mode must be one of {_VALID_MODES}, got {self.mode!r}")
        object.__setattr__(self, "fields", frozenset(normalize_name(f) for f in self.fields))

    def selected_columns(self, columns: list[str]) -> list[str]:
        """Resolve the output column list, preserving source order."""
        essential = {f for f in self.essential_fields if f in columns}
        if self.mode == "all":
            keep = set(columns)
        elif self.mode == "include":
            keep = (self.fields & set(columns)) | essential
        else:  # exclude
            keep = (set(columns) - self.fields) | essential
        return [c for c in columns if c in keep]


def select_fields(df: DataFrame, rule: FieldSelectionRule) -> DataFrame:
    """Apply the rule; essential fields survive regardless of mode."""
    return df.select(*rule.selected_columns(list(df.columns)))
