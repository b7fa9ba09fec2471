"""Slowly-changing-dimension Type 2 merge — the evolution of the
reference's upsert-ignore dims (initdb/01_schema.sql:13-55) once history
matters: instead of ignoring re-uploads of a changed attribute (S5's
ON CONFLICT DO NOTHING keeps the stale row), close the current version and
append the new one, preserving full attribute history.

Pure batch DataFrame composition (no table format required): the same
single-writer caveat as operators/upsert.py applies. On Delta/Iceberg this
becomes one MERGE with matched/not-matched branches; the column contract
(valid_from / valid_to / is_current) is identical.

Scale: one hash shuffle on the natural key to diff current-vs-incoming;
attribute comparison is a null-safe hash of the tracked columns (computed
map-side, so the join carries one long per row, not every attribute);
unchanged rows pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(dim: DataFrame, effective_date: str) -> DataFrame:
    """Bootstrap a Type-2 dimension from a plain snapshot."""
    return (
        dim.withColumn("valid_from", F.lit(effective_date).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )


def _attr_hash(cols: list[str]) -> F.Column:
    # null-safe: hash the concat of nullif-tagged values; xxhash64 is
    # engine-internal only (never compared across engines)
    return F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols])


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_date: str,
) -> DataFrame:
    """Merge an update snapshot into a Type-2 dimension.

    * new key → insert as current (valid_from = effective_date)
    * existing key, changed attrs → close old row (valid_to, is_current
      False), insert new current version
    * existing key, unchanged → untouched
    * key absent from updates → untouched (no implicit deletes)

    ``updates`` carries key + attr columns only (one row per key — enforced
    here by dropDuplicates); history columns are managed here. Idempotent
    for a repeated identical snapshot. Attribute change detection is a
    64-bit hash compare (false-unchanged odds 2^-64 per row).
    """
    # column contract: the dimension must be exactly key + tracked attrs +
    # meta. Untracked (Type-1 style) extra columns would be silently
    # unresolvable when rebuilding inserted rows — fail loudly instead.
    expected = set(key_cols) | set(attr_cols) | set(META_COLS)
    extra = [c for c in current.columns if c not in expected]
    if extra:
        raise ValueError(
            f"scd2_merge: dimension has columns outside key+attr+meta: {extra}; "
            "track them in attr_cols or project them out before merging"
        )
    eff = F.lit(effective_date).cast("date")
    updates = updates.dropDuplicates(key_cols)
    cur_live = current.filter(F.col("is_current"))
    # closed-out history rows are immutable — they must survive every merge
    # untouched, including further changes to their key
    history = current.filter(~F.col("is_current"))
    cur_hash = cur_live.withColumn("_h", _attr_hash(attr_cols))
    upd_hash = updates.withColumn("_h_new", _attr_hash(attr_cols))

    upd_keyed = upd_hash.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        *[F.col(a).alias(f"_a_{a}") for a in attr_cols],
        "_h_new",
    )
    join_cond = [F.col(k) == F.col(f"_k_{k}") for k in key_cols]
    diff = cur_hash.join(upd_keyed, join_cond, "full_outer")

    k0 = f"_k_{key_cols[0]}"
    is_new_key = F.col(key_cols[0]).isNull()
    is_changed = (
        F.col(key_cols[0]).isNotNull()
        & F.col(k0).isNotNull()
        & (F.col("_h") != F.col("_h_new"))
    )

    closed = (
        diff.filter(is_changed)
        .select(*[c for c in current.columns if c not in ("valid_to", "is_current")])
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
        .select(*current.columns)
    )
    inserted = (
        diff.filter(is_new_key | is_changed)
        .select(
            *[F.col(f"_k_{k}").alias(k) for k in key_cols],
            *[F.col(f"_a_{a}").alias(a) for a in attr_cols],
        )
        .withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
        .select(*current.columns)
    )
    changed_keys = diff.filter(is_changed).select(
        *[F.col(f"_k_{k}").alias(k) for k in key_cols]
    )
    live_untouched = cur_live.join(changed_keys, key_cols, "left_anti")
    return (
        history.unionByName(live_untouched)
        .unionByName(closed)
        .unionByName(inserted)
    )
