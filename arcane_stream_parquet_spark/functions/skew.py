"""Skew-handling helpers: salted joins for hot keys.

AQE's skew-join splitting (on globally, session.py) handles most skew
at runtime; salting is the PLAN-level tool for the pathological case it
can't fix — a broadcast-ineligible join where one key carries a large
fraction of all rows (the viral-document / null-key classic).

``salted_join``: the skewed (large) side gets a random-ish salt in
[0, salt_factor); the small-but-not-broadcastable side is exploded
``salt_factor`` times so every (key, salt) pair finds its match. The
hot key's rows spread over ``salt_factor`` reducers instead of one.
Salt is derived from a hash of the whole row's monotonically increasing
id — deterministic per run layout, uniform, no RNG state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__asp_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated ``salt_factor`` times. Semantically identical to
    ``skewed.join(other, on, how)`` for inner/left joins; the cost is
    ``salt_factor``× the small side (choose it ≪ broadcast threshold
    ÷ its size — if the small side broadcasts, use broadcast instead).
    """
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner|left")
    on = list(on)
    salted = skewed.withColumn(
        _SALT,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_factor)).cast(
            "int"
        ),
    )
    replicated = other.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    return salted.join(replicated, [*on, _SALT], how).drop(_SALT)
