"""Z-order (Morton-curve) multi-column clustering expressions.

The merge target's single-column ``sorted_by`` gives each data file a
tight contiguous range in ONE dimension — ``read_where`` then prunes
date windows to O(matching files) (SCALE.md skipping probe) but a
predicate on any second column still plans every file.  Z-ordering is
the standard lakehouse answer (Delta ``OPTIMIZE ZORDER BY``, Iceberg's
sort-order z-curve): map each clustering column to a small equi-depth
integer code, interleave the codes' bits into one Morton value, and
sort files by that value — every file then covers a bounded range in
EVERY clustered dimension, so the same per-file min/max stats prune
multi-column windows.

Reference parity note: the reference's table properties expose only a
lexicographic ``sortedBy`` (docs/crd.md:229-232); z-ordering is a
beyond-reference extension motivated by its production sink being
Iceberg, where multi-dimensional clustering is the documented path to
file skipping on secondary predicates.

Execution shape (100 TB posture):

- ONE extra aggregation pass over the batch per write computes
  equi-depth boundaries via ``percentile_approx`` (all columns in a
  single job; driver receives ``d × (2^bits - 1)`` scalars).
- The per-row code is a BALANCED ``when``-tree binary search over the
  boundaries — depth = ``bits`` comparisons per row, pure Catalyst
  expressions inside whole-stage codegen.  No interpreted
  higher-order functions, no UDFs, no joins, no shuffle beyond the
  writer's existing repartition-by-bucket.
- Boundaries are per-write-batch: layout quality needs only LOCAL
  monotonicity (rows in this write sorted sensibly); correctness
  never depends on them because ``read_where`` prunes on the TRUE
  per-file min/max recorded by ``_collect_file_stats``, not on the
  z-codes.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: numeric + temporal types with a well-defined quantile domain;
#: strings are deliberately excluded (percentile_approx has no string
#: domain and a collation-dependent code would be quietly wrong —
#: cluster on a numeric surrogate instead, e.g. a prefix hash)
ZORDER_TYPES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "date",
    "timestamp",
    "timestamp_ntz",
)

_EPOCH = datetime.date(1970, 1, 1)


def _as_double(col: str, dtype: str) -> Column:
    """Order-preserving double view of a clusterable column.

    ``timestamp_ntz`` has no direct double cast; the hop through the
    session-zone ``timestamp`` is monotone except inside a DST
    fall-back hour — acceptable for a layout code (a rare 1-hour
    inversion widens one file's recorded range; pruning correctness
    reads the true stats, never the code).
    """
    c = F.col(col)
    if dtype == "date":
        return F.datediff(c, F.lit(_EPOCH)).cast("double")
    if dtype == "timestamp_ntz":
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def validate_zorder_type(col: str, dtype) -> str:
    s = dtype.simpleString()
    if s not in ZORDER_TYPES:
        raise TypeError(
            f"cluster_by[{col!r}]: unsupported type {s} "
            f"(quantile-domain scalars only: {', '.join(ZORDER_TYPES)})"
        )
    return s


def _validate_zwidth(bits: int, d: int) -> None:
    """The Morton value is a BIGINT: the top bit position is
    ``bits*d - 1`` and Java masks long shift counts to 6 bits, so any
    width past 63 would silently wrap bit positions and degrade the
    layout to near-random (pruning would stay correct — it reads true
    per-file stats — but the clustering would be pointless).  Reject
    loudly instead."""
    if bits * d > 63:
        raise ValueError(
            f"z-order width bits*len(cols) = {bits}*{d} = {bits * d} "
            f"exceeds 63 (bigint Morton value): lower bits to "
            f"{63 // d} or cluster fewer columns"
        )


def cluster_boundaries(
    df: DataFrame, cols: tuple, bits: int = 7, accuracy: int = 10_000
) -> dict:
    """Equi-depth code boundaries per clustering column, from ONE
    aggregation job over ``df``: ``{col: [b_1 … b_(2^bits - 1)]}``
    (ascending, may repeat under heavy skew — repeated boundaries
    collapse codes and clustering degrades gracefully toward the
    skewed value's bucket)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    _validate_zwidth(bits, len(cols))
    n = (1 << bits) - 1
    probs = [i / (n + 1) for i in range(1, n + 1)]
    aggs = []
    for col in cols:
        dtype = validate_zorder_type(col, df.schema[col].dataType)
        aggs.append(
            F.percentile_approx(
                _as_double(col, dtype), probs, accuracy
            ).alias(col)
        )
    row = df.agg(*aggs).collect()[0]
    out = {}
    for col in cols:
        bounds = row[col]
        # all-null column: no quantiles; constant code 0
        out[col] = [float(b) for b in bounds] if bounds is not None else []
    return out


def _search_tree(c: Column, bounds: list, lo: int, hi: int) -> Column:
    # balanced binary search over bucket indices [lo, hi]:
    # value <= bounds[mid]  ->  left half.  Depth = ceil(log2(#buckets))
    # comparisons per row, all codegen-friendly CASE WHEN.
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        c <= F.lit(bounds[mid]), _search_tree(c, bounds, lo, mid)
    ).otherwise(_search_tree(c, bounds, mid + 1, hi))


def code_expr(col: str, dtype: str, bounds: list) -> Column:
    """0-based equi-depth integer code of a column against its
    boundaries; nulls code as 0 (they sort first, mirroring the
    NULLS FIRST default of the lexicographic ``sorted_by`` path)."""
    if not bounds:
        return F.lit(0)
    d = _as_double(col, dtype)
    return F.when(d.isNull(), F.lit(0)).otherwise(
        _search_tree(d, bounds, 0, len(bounds))
    )


def interleave_expr(codes: list, bits: int) -> Column:
    """Morton value of per-column code expressions: bit ``b`` of
    column ``j`` lands at position ``b*d + j``, so equal-order bits of
    all dimensions are adjacent — the property that bounds every
    file's per-dimension extent.

    Codes are widened to BIGINT before the shift: Java masks INT shift
    counts to 5 bits, so positions >= 32 (bits=7 with 5+ columns, or
    bits=16 with 3) would silently wrap into garbage Morton values.
    Widths past the 63-bit bigint capacity are rejected."""
    _validate_zwidth(bits, max(len(codes), 1))
    z = None
    for b in range(bits):
        for j, code in enumerate(codes):
            # the RIGHT shift widens too: an INT code with b >= 32
            # (d=1, bits up to 63 is legal here) would mask the shift
            # count to 5 bits exactly like the shiftleft case below
            bit = F.shiftleft(
                F.shiftright(code.cast("bigint"), b).bitwiseAND(
                    F.lit(1).cast("bigint")
                ),
                b * len(codes) + j,
            )
            z = bit if z is None else z.bitwiseOR(bit)
    return z if z is not None else F.lit(0)


def zvalue_expr(
    df: DataFrame, cols: tuple, bits: int = 7, accuracy: int = 10_000
) -> Column:
    """The full z-value sort expression for ``df`` over ``cols`` —
    boundary scan + per-column code trees + bit interleave.  Triggers
    one aggregation job (the boundary scan) at call time."""
    bounds = cluster_boundaries(df, cols, bits=bits, accuracy=accuracy)
    codes = [
        code_expr(c, df.schema[c].dataType.simpleString(), bounds[c])
        for c in cols
    ]
    return interleave_expr(codes, bits)
