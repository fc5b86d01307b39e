"""As-of (time-travel) join — a beyond-reference operator (SURVEY.md
§2.3 marks all general joins [abs]; the engine exposes them as
first-class ops).

``asof_join(left, right, on, ...)``: for every left row, attach the
columns of the single right row with the greatest ``right_ts <=
left_ts`` within the same key group (direction="backward"; "forward"
symmetric).

Spark-first realization — NOT the naive range join + max-aggregate
(which explodes to O(|L|·|R|) pairs per key before reducing): union the
two sides, sort within key partition by time, carry the latest right
value forward with ``last(..., ignorenulls=True)`` over a growing
window, keep left rows. Cost: ONE hash shuffle on the key + a partition
sort — the same as a sort-merge join, linear in |L|+|R|, skew handled by
AQE. This is the standard large-scale as-of pattern and works unchanged
at 100 TB (no per-key state on the driver).

Tie rule: a right row with ``right_ts == left_ts`` matches (the window
orders right rows before left rows at equal timestamps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE_COL = "__asp_side"
_TS_COL = "__asp_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. Result: all ``left`` columns + each right value
    column as ``<name><suffix>`` (NULL when no right row qualifies)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in on and c != right_ts]

    out_cols = {c: f"{c}{suffix}" for c in right_value_cols}

    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(_TS_COL),
        F.lit(1).alias(_SIDE_COL),
        *[F.lit(None).cast(right.schema[c].dataType).alias(v) for c, v in out_cols.items()],
    )
    right_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS_COL),
        F.lit(0).alias(_SIDE_COL),
        *[F.col(c).alias(v) for c, v in out_cols.items()],
    ).select(*left_tagged.columns)  # align column order for union

    if direction == "backward":
        # right rows sort before left rows at equal ts ⇒ "<=" semantics
        order = [F.col(_TS_COL).asc(), F.col(_SIDE_COL).asc()]
        frame = Window.partitionBy(*on).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    else:
        order = [F.col(_TS_COL).desc(), F.col(_SIDE_COL).asc()]
        frame = Window.partitionBy(*on).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )

    unioned = left_tagged.unionByName(right_tagged)
    for _, v in out_cols.items():
        unioned = unioned.withColumn(v, F.last(F.col(v), ignorenulls=True).over(frame))

    return unioned.filter(F.col(_SIDE_COL) == 1).drop(_SIDE_COL, _TS_COL)
