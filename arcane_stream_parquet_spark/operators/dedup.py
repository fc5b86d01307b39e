"""Latest-version-per-key dedup (reference: J2, SURVEY.md §2.3).

The reference's ``UpsertBlobStagedBatchFactory`` reduces a staged batch
to one row per ``arcane_merge_key``, latest ``createdon`` wins
(main.scala:31,101) — MERGE requires a unique source key. Proven by the
integration test: 5,000 staged rows / 100 distinct keys → 100 rows
(IntegrationTests.scala:176,181).

Spark realization: ranking window. This shuffles once on the key —
exactly the hash-partition a subsequent key-equi MERGE needs, so at
scale the exchange is reused by the join stage. Skewed keys are handled
by AQE skew-join; there is no driver-side state.

Tie-break: the reference leaves equal-``createdon`` ordering undefined
(SURVEY.md §7 risks). We require explicit ``tiebreakers`` for a total
order so results are deterministic and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.functions.keys import VERSION_COLUMN

_ROW_NUMBER_COL = "__asp_rn"


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str = VERSION_COLUMN,
    tiebreakers: Sequence[str | Column] = (),
) -> DataFrame:
    """Keep the single latest row per key.

    Order: ``version_col`` DESC, then each tiebreaker DESC. Pass enough
    tiebreakers to make the order total, or the surviving row among
    exact version ties is undefined (matches reference's undefined
    behavior, but breaks oracle checks — tests always pass tiebreakers).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    order = [F.col(version_col).desc()]
    for tb in tiebreakers:
        order.append(F.col(tb).desc() if isinstance(tb, str) else tb)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn(_ROW_NUMBER_COL, F.row_number().over(w))
        .filter(F.col(_ROW_NUMBER_COL) == 1)
        .drop(_ROW_NUMBER_COL)
    )
