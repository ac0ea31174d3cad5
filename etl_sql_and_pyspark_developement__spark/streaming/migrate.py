"""Checkpoint STATE-REBUILD migration — the upgrade playbook the
state-schema evolution probe (tests/test_streaming.py) pins the need
for, implemented. Spark's state store refuses an ADDED/retyped state
field on restart (STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE — the check
is type-shaped and non-destructive), so widening a stateful
operator's state struct requires a NEW checkpoint seeded with the old
query's state. OSS Spark has no batch state WRITER (the statestore
format is read-only, and applyInPandasWithState takes no initial
state), so the seed channel is the query's own input: export the old
state (st40's reader), inverse-transform it into a REHYDRATION BATCH
of synthetic input rows that fold back to the identical state, make
that batch the new source's first file, and drain it with
Trigger.AvailableNow (st35's bounded runtime) under the new
checkpoint. The new query then resumes on live data with zero data
loss — and because the folds this suite ships are associative /
commutative / idempotent (the st27 algebra), the rehydrated state is
BIT-EXACT, not approximate.

Requirements on the lane (documented, not hidden):
  - the fold's state must be INVERTIBLE to an equivalent input batch
    (true for set/bitmap/min-k/max-k state: st31's bitmap word
    decomposes into one synthetic id per set bit; a min-k triple set
    replays as its k rows);
  - NEW state fields initialize from the rehydration batch per the
    new fold's own semantics (a counter of rows-folded counts the
    synthetic rows, not the historical ones — the migration contract
    states what the new field means from the cutover forward).

Subject lane: st31's bitmap distinct, widened from state `word
bigint` to `(word bigint, n_folds bigint)` — the cleanest bit-exact
demonstration (BIT_OR is idempotent, so the word survives any
re-fold unchanged).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_sql_and_pyspark_developement__spark.streaming.statestore import (
    read_state,
)


def bitmap_rehydration_rows(state: DataFrame) -> DataFrame:
    """Inverse transform for st31's bitmap state: each set bit b of a
    (event_type, bucket, word) state row becomes the one synthetic
    user_id `bucket*63 + b` that sets exactly that bit (the update
    fn's key/bit derivation is uid DIV 63 / uid % 63, so the round
    trip is exact). BIT_OR folds the batch back to the identical
    word — bit-for-bit, because OR is idempotent. Pure codegen
    (sequence + filter + explode), no Python in the transform."""
    return (
        state.select(
            F.col("key.event_type").alias("event_type"),
            F.col("key.bucket").alias("bucket"),
            # applyInPandasWithState wraps user state one level deeper
            # than a native agg: value.groupState.<field> (st40 pin)
            F.col("value.groupState.word").alias("word"),
        )
        .select(
            "event_type",
            F.explode(
                F.expr(
                    "filter(sequence(0, 62),"
                    " b -> (shiftright(word, b) & 1) = 1)"
                )
            ).alias("bit"),
            "bucket",
        )
        .select(
            "event_type",
            (F.col("bucket") * 63 + F.col("bit")).alias("user_id"),
        )
    )


BITMAP_V2_OUTPUT_SCHEMA = (
    "event_type string, bucket bigint, n_distinct bigint, n_folds bigint"
)
BITMAP_V2_STATE_SCHEMA = "word bigint, n_folds bigint"


def _bitmap_v2_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """st31's fold WIDENED by one state field (n_folds: rows folded
    into this key since the v2 cutover — the added-field semantics the
    migration contract defines). The word fold is byte-identical to
    v1's, which is what makes the bit-exact survival provable."""
    (etype, bucket) = key
    word, n_folds = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            word |= 1 << (int(uid) % 63)
            n_folds += 1
    state.update((word, n_folds))
    yield pd.DataFrame(
        {
            "event_type": [etype],
            "bucket": [bucket],
            "n_distinct": [int(word).bit_count()],
            "n_folds": [n_folds],
        }
    )


def streaming_bitmap_distinct_v2(events: DataFrame) -> DataFrame:
    """The widened (v2) twin of stateful.streaming_bitmap_distinct:
    same keying, same word fold, one added state field — the upgrade
    that a direct restart of the v1 checkpoint refuses
    (STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE) and this module's
    migration performs."""
    keyed = events.select(
        "event_type",
        F.expr("user_id DIV 63").alias("bucket"),
        "user_id",
    )
    return keyed.groupBy("event_type", "bucket").applyInPandasWithState(
        _bitmap_v2_update,
        BITMAP_V2_OUTPUT_SCHEMA,
        BITMAP_V2_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def migrate_stateful_checkpoint(
    spark: SparkSession,
    old_checkpoint: str,
    rehydrate,
    source_dir: str,
    start_new_query,
    *,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> None:
    """Run the state-rebuild migration:

    1. EXPORT the old checkpoint's keyed state (st40's statestore
       reader; `batch_id` time-travels if the stop wasn't clean).
    2. INVERSE-TRANSFORM it to a rehydration batch via `rehydrate`
       (a DataFrame -> DataFrame fn like bitmap_rehydration_rows).
    3. SEED: write the batch as the first file of `source_dir` —
       the new query's own source, so the state enters through the
       fold itself (the only OSS-pure channel; no state writer).
    4. DRAIN: `start_new_query(source_dir, ...)` must return a
       started StreamingQuery over source_dir with the NEW
       checkpoint; the helper awaits its AvailableNow termination so
       the seed batch is committed before live data flows.

    After return, the caller appends live files to source_dir and
    restarts the new query on its checkpoint — st35's
    backfill-and-continue, now carrying the old query's state."""
    old_state = read_state(
        spark, old_checkpoint, operator_id=operator_id, batch_id=batch_id
    )
    seed = rehydrate(old_state)
    os.makedirs(source_dir, exist_ok=True)
    seed.write.mode("append").parquet(source_dir)
    q = start_new_query(source_dir)
    q.awaitTermination()
