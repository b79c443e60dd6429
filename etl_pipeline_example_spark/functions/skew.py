"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (on in this engine's session factory) handles
most skew at runtime, but it only helps sort-merge joins reading shuffle
files; a pathologically hot key in a shuffled hash join — one user with
10% of a 100 TB event table — still lands on one reducer. Salting is the
explicit fix: replicate the small side R times, scatter the big side's
hot keys across R sub-keys, join on (key, salt), and the hot key's rows
spread over R tasks.

``salted_join`` applies the standard formulation: the big side gets a
uniform random salt in [0, R); the small side is exploded R× so every
(key, salt) pair exists. Row multiplicity of the result is unchanged —
each big-side row matches exactly one replica. The salt column is
dropped on output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` with ``small`` on column ``on``, salted ``num_salts`` ways.

    Supports inner and left joins (the shapes where the big side drives
    the result). The small side is exploded num_salts×, so keep it to
    dimension scale — for fact-fact skew, prefer AQE skew splitting or
    isolate the hot keys and union a broadcast join for just those.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    joined = salted_big.join(salted_small, [on, "__salt"], how)
    return joined.drop("__salt")
