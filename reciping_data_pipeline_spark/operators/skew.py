"""Skew-mitigation join utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
complementary *plan-level* tool for the case AQE can't fix: a shuffle
join where one side has a handful of pathological hot keys (the
power-law user, the empty-string default, the null-ish sentinel) and
the other side is too large to broadcast. Replicating the small-ish
side ``salt_factor`` ways bounds any single task's share of a hot key
at 1/salt_factor.

Semantics are identical to the plain inner join (asserted in tests):
salting only changes the physical key space.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_inner_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_factor: int = 8,
) -> DataFrame:
    """Inner equi-join with the LEFT side's hot keys spread across
    ``salt_factor`` sub-keys and the RIGHT side replicated to match.

    Use when: left is large AND skewed on ``on``; right is too big to
    broadcast but small enough that salt_factor× replication is cheaper
    than a straggler task. Shuffle volume: |left| + salt_factor·|right|
    rows, but the hot key's rows now land on salt_factor tasks.
    """
    salted_left = left.withColumn("_salt", (F.rand(seed=7) * salt_factor).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    salted_right = right.withColumn("_salt", salts)
    out = salted_left.join(salted_right, on=[on, "_salt"], how="inner").drop("_salt")
    return out
