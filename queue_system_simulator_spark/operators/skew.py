"""Skew-salting for joins whose hot keys defeat hash partitioning.

AQE's skew-join handling (on by default, session.py) splits oversized
partitions at runtime and is the first line of defense.  This helper is the
*explicit* form for when the skew is known ahead of time (a null-key flood,
one mega-tenant) or AQE is unavailable (streaming joins):

``salted_join(left, right, key, salt)`` replicates each RIGHT row ``salt``
times and scatters LEFT rows uniformly across the salt space, so a hot key
spreads over ``salt`` reducers instead of one.  Replication cost is
``salt × |right|`` — use it with the *smaller* (but not broadcastable)
side on the right, and pick ``salt`` ≈ the skew factor.

The result is row-identical to ``left.join(right, key)`` (inner join);
only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join on ``on`` with the hot-key load spread ``salt`` ways."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    salted_right = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(salted_right, [on, SALT_COL], how)
    return out.drop(SALT_COL)
