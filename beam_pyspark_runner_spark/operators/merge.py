"""MERGE / upsert composed from relational primitives.

Spark SQL on plain parquet has no transactional MERGE INTO (that is a
table-format feature — Delta/Iceberg/Hudi); what a pipeline needs from
MERGE is the *dataset algebra*: updates win over base, unmatched
updates insert, unmatched base survives. That is exactly

    merged = updates ∪ (base ⟕anti updates on key)

— one anti join plus a union, both Catalyst-native. The reference
engine has no notion of this at all (its only sink is whatever a DoFn
writes); here it is a first-class operator the upsert query oracles
against plain SQL.

Scale notes (100 TB): the anti join shuffles base on the merge key once
— broadcast the updates side when it is a small delta (the common case:
daily increment ≪ base). With bucketed base tables the anti join
co-locates and the merge is shuffle-free; writing the merged result
back bucketed keeps the property for the next increment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    broadcast_updates: bool = False,
) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``keys``: update rows replace
    base rows with the same key, new keys insert, untouched base rows
    pass through. Columns must match by name (enforced by unionByName).

    ``broadcast_updates``: hint the anti join to broadcast the updates
    side — set it when the delta is small relative to base, which turns
    the merge into a single map-side pass over base."""
    upd = F.broadcast(updates) if broadcast_updates else updates
    survivors = base.join(upd.select(*keys), keys, "left_anti")
    return updates.unionByName(survivors)
