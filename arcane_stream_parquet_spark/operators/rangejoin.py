"""Binned range/interval join — a beyond-reference operator (SURVEY.md
§2.3 [abs]): match point events to intervals WITHOUT an equi-key.

The naive plan for ``L.point BETWEEN R.start AND R.end`` with no equi
condition is a broadcast-nested-loop / cartesian product — O(|L|·|R|),
disqualifying at scale. The standard fix: quantize the axis into bins of
width ≥ the typical interval length; each interval explodes to the bins
it covers, each point has exactly ONE bin, and the join becomes an
equi-join on the bin id + an exact range filter. Each qualifying pair
meets exactly once (the point's single bin), so no dedup pass is needed.

Cost: |R| × (avg interval span / bin width) exploded rows, one hash
shuffle on the bin id. Bin width is the skew/selectivity dial; AQE
splits hot bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__asp_bin"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: int,
) -> DataFrame:
    """Inner join: left rows × right intervals containing their point
    (inclusive bounds). Numeric axis (epoch days/micros/any long)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    r = right.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bin_width).cast("long"),
                F.floor(F.col(right_end) / bin_width).cast("long"),
            )
        ),
    )
    l_binned = left.withColumn(
        _BIN, F.floor(F.col(left_point) / bin_width).cast("long")
    )
    return (
        l_binned.join(r, _BIN)
        .filter(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) <= F.col(right_end))
        )
        .drop(_BIN)
    )
