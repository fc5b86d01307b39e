"""As-of (time-travel) join — a beyond-reference operator (SURVEY.md
§2.3 marks all general joins [abs]; the engine exposes them as
first-class ops).

``asof_join(left, right, on, ...)``: for every left row, attach the
columns of the single right row with the greatest ``right_ts <=
left_ts`` within the same key group (direction="backward"; "forward" =
smallest ``right_ts >= left_ts``).

Spark-first realization — NOT the naive range join + max-aggregate
(which explodes to O(|L|·|R|) pairs per key before reducing): union the
two sides, sort within key partition by time, and carry the latest
right ROW forward as ONE struct with ``last(struct, ignorenulls=True)``
over a growing window; keep left rows and explode the struct. Cost: ONE
hash shuffle on the key + a partition sort — the same as a sort-merge
join, linear in |L|+|R|, skew handled by AQE. This is the standard
large-scale as-of pattern and works unchanged at 100 TB (no per-key
state on the driver).

The struct carry is what makes the matched row ATOMIC: all its value
columns (including genuine NULLs) travel together — carrying each
column independently with ignorenulls would skip real NULLs and could
stitch columns from different right rows (the round-1 bug, ADVICE.md).

Tie rule: a right row with ``right_ts == left_ts`` matches (the window
orders right rows before left rows at equal timestamps). Among several
right rows at the SAME (key, ts), the one greatest under ``tiebreakers``
(or the last in window order if none given) wins — pass tiebreakers for
a deterministic result on tie-capable data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_SIDE_COL = "__asp_side"
_TS_COL = "__asp_ts"
_ROW_COL = "__asp_rrow"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join. Result: all ``left`` columns + each right value
    column as ``<name><suffix>`` (NULL when no right row qualifies)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_value_cols = list(right_value_cols)

    row_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )

    left_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS_COL),
        F.lit(1).alias(_SIDE_COL),
        F.lit(None).cast(row_type).alias(_ROW_COL),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{t}") for t in tiebreakers],
    )
    right_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        *on,
        F.col(right_ts).alias(_TS_COL),
        F.lit(0).alias(_SIDE_COL),
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias(_ROW_COL),
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreakers],
    ).select(*left_tagged.columns)  # align column order for union

    ts_order = F.col(_TS_COL).asc() if direction == "backward" else F.col(_TS_COL).desc()
    # right rows (side=0) sort before left rows at equal ts ⇒ inclusive
    # match; within the equal-(key,ts) right group, tiebreakers sort
    # ascending so the LAST carried row (max tiebreaker) is the
    # deterministic winner.
    order = [
        ts_order,
        F.col(_SIDE_COL).asc(),
        *[F.col(f"__tb_{t}").asc() for t in tiebreakers],
    ]
    frame = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = left_tagged.unionByName(right_tagged)
    carried = unioned.withColumn(
        _ROW_COL, F.last(F.col(_ROW_COL), ignorenulls=True).over(frame)
    )
    return carried.filter(F.col(_SIDE_COL) == 1).select(
        *[c for c in left.columns],
        *[F.col(_ROW_COL)[c].alias(f"{c}{suffix}") for c in right_value_cols],
    )
