"""State-store READER (st40) — the ops/debug surface for every
stateful lane's checkpoint.

`spark.read.format("statestore")` opens a streaming checkpoint's
keyed state as a batch DataFrame (key struct, value struct,
partition_id), and `format("state-metadata")` lists the stateful
operators a checkpoint carries (operator id/name, store name,
partition count, batch range). Together they answer the two
questions a production on-call actually asks of a misbehaving
stream — "what operators hold state here?" and "what is IN that
state right now?" — without touching the running query or writing a
probe sink.

This is also the first INDEPENDENT verification channel for the 38
stateful lanes: the parity tests compare a query's EMITTED rows to a
batch twin; reading the store compares what was PERSISTED. The two
can diverge (emit-then-crash, state corruption, provider bugs), and
only the reader sees the second side. Works identically under HDFS
and RocksDB providers — the reader resolves the provider from the
checkpoint, so the same assertions run in the SPARK_GRAFT_ROCKSDB=1
pass.

At 100 TB: state surgery (dropping a poison key, backfilling after a
schema change) starts with exactly these reads; the reader scales
like any parquet-ish source — one task per state partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """One row per (stateful operator, state store) in the
    checkpoint: operatorId/operatorName/stateStoreName/numPartitions
    and the [minBatchId, maxBatchId] range readable by
    read_state(batch_id=...)."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """The keyed state of one operator as (key struct, value struct,
    partition_id). Defaults to the LATEST committed batch; pass
    batch_id to time-travel to any batch the metadata lists —
    the post-incident diff ("what changed in state between batch N
    and N+1") is two of these reads and an EXCEPT."""
    reader = spark.read.format("statestore").option(
        "operatorId", operator_id
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)
