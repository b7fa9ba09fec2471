"""Skew mitigation: salting for hot keys.

AQE's skew-join handling (on in session.py) splits oversized sort-merge
partitions at runtime, and Spark's hash aggregate already map-side-combines
algebraic aggs — so most skew is handled for free. Salting is for the two
cases that remain:

* ``salted_aggregate`` — aggregations whose partial state does NOT shrink
  (collect_list/collect_set, exact count-distinct): one hot key funnels its
  entire value set through one reducer. Two phases: aggregate on
  (key, salt), then merge the per-salt partials. Only algebraically
  mergeable aggs are legal — the caller supplies both phases explicitly.
* ``replicate_salted_join`` — a hot-key equi join where the other side is
  too big to broadcast but small enough to replicate ``salt`` times: the
  skewed side gets a random salt in [0, salt), the other side is exploded
  across ALL salt values, and the join key becomes (key, salt). The hot
  key's rows now land on ``salt`` reducers instead of one. Result is
  row-identical to the unsalted join (inner/left semantics preserved).

Both are exact rewrites — tested for equality against the naive plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then keys.

    ``partial_aggs`` run per (key, salt) shard; ``merge_aggs`` combine the
    shard results per key and must reference the partial alias names.
    Example (skew-safe distinct count):

        partial = [F.collect_set("user_id").alias("users")]
        merge   = [F.size(F.array_distinct(F.flatten(F.collect_list("users"))))
                     .alias("n_users")]
    """
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(F.rand(seed=0)), F.lit(salt)))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def replicate_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Equi join with the skewed side salted and ``other`` replicated.

    Output equals ``skewed.join(other, on, how)`` for 'inner' and 'left';
    shuffle keys become (on + salt) so a hot key spreads over ``salt``
    reducers. ``other`` grows by the replication factor — keep salt modest
    (8-32); if ``other`` fits a broadcast, broadcast instead, it's free.
    """
    if how not in ("inner", "left"):
        raise ValueError("replicate_salted_join supports inner/left joins")
    left = skewed.withColumn(
        _SALT, F.floor(F.rand(seed) * salt).cast("int")
    )
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return left.join(right, [*on, _SALT], how).drop(_SALT)
