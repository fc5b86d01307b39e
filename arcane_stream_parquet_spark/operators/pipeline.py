"""Pipeline composition with lineage management — the API form of the
SCALE.md r13 composition rule.

Chaining a handful of operators is free (Catalyst fuses them), but a
long curation pipeline compounds its logical plan: every stage with
the clean-then-join-the-metadata-back shape references its INPUT plan
twice, so the tree doubles per stage (2^stages — pinned in
tests/test_compose_stages.py), and plan printing/analysis walk the
expansion. Measured at stage 10 of the real funnel: a 1.5 GB plan
string OOMs the driver, with 10-100x stage walls that are analyzer
time, not execution (scripts/pipeline_probe.py). The fix is
structural: cut the logical lineage at stage boundaries.
Production pipelines writing each phase into the merge target get the
cut for free; for in-memory composition this module makes it one call.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

#: lineage-cut strategies for :func:`compose_stages`
CUTS = ("local_checkpoint", "none")


def compose_stages(
    df: DataFrame,
    stages: Sequence[Callable[[DataFrame], DataFrame]],
    cut: str = "local_checkpoint",
    eager: bool = False,
) -> DataFrame:
    """Apply ``stages`` (each a ``DataFrame -> DataFrame`` callable) in
    order, cutting logical lineage between stages.

    ``cut="local_checkpoint"`` truncates the plan after every stage via
    ``localCheckpoint`` (``eager=False`` defers materialization to the
    first action, so unexecuted pipelines stay lazy); ``cut="none"``
    chains raw — correct for short pipelines, quadratic-to-fatal
    analyzer cost for long ones (module docstring). At 100 TB prefer
    materializing stage boundaries into real tables (fault-tolerant and
    resumable, which executor-local checkpoints are not); this helper
    is the in-memory equivalent for interactive/bounded runs.
    """
    if cut not in CUTS:
        raise ValueError(f"cut must be one of {CUTS}: {cut!r}")
    for s in stages:
        df = s(df)
        if cut == "local_checkpoint":
            df = df.localCheckpoint(eager=eager)
    return df
