"""CDC-style merge/upsert — the warehouse MERGE INTO, batch-expressed.

SCD1 (latest-wins) upsert of an updates batch into a target snapshot:
union both sides, rank per key by (version, side) and keep the winner.
One shuffle on the key; with a bucketed target
(``sources.bucketed.save_bucketed``) the target side never re-shuffles
and only the day's batch moves — the incremental-dedup precedent
(``operators/dedup.incremental_exact_dedup``).

Why a window, not a join: MERGE semantics need "newest version per key
across BOTH relations", which is exactly one rank — an anti-join + union
formulation shuffles the same data twice and still can't break version
ties inside the updates batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    *,
    key_cols: str | list[str],
    version_col: str | None = None,
) -> DataFrame:
    """Latest-wins upsert: rows in ``updates`` replace same-key rows in
    ``target``; unmatched keys insert.  With ``version_col``, the
    higher version wins regardless of side (late-arriving CDC events);
    ties break toward ``updates``.  Deletes are an upstream filter
    (ship a tombstone column and drop post-merge), not this operator.

    Columns must match (unionByName); output schema == input schema.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = target.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(cols)} vs updates {sorted(updates.columns)}"
        )
    t = target.withColumn("__side", F.lit(0))
    u = updates.select(*cols).withColumn("__side", F.lit(1))
    unioned = t.unionByName(u)
    order = (
        [F.col(version_col).desc(), F.col("__side").desc()]
        if version_col
        else [F.col("__side").desc()]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*cols)
    )
