"""Custom PYTHON DATA SOURCE (Spark 4 Python Data Source API): a
deterministic synthetic-documents generator registered as a real
DataSource V2 format — the "write a connector without a JVM jar"
surface a reference user migrating a bespoke feed needs. The reader
declares PARTITIONS, so Spark schedules the generation across
executors like any other scan (parallelism asserted in tests), and
every column is md5 arithmetic on the row index — the p03/p07
determinism discipline — so a DuckDB oracle replays the whole "table"
from generate_series bit-for-bit.

This is an integration/simulation surface, not a hot path: rows cross
the Python worker boundary (the API's contract), which is exactly
right for test corpora, backfill simulation, and connector prototyping
— and exactly wrong for a 100 TB scan (use parquet). The docstring is
the warning label.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_DOCS_SCHEMA = (
    "doc_id BIGINT, lang STRING, n_tokens BIGINT, score_ppm BIGINT"
)

_LANGS = ["en", "de", "fr", "es", "und"]


def synth_doc_row(i: int) -> tuple:
    """The generator kernel, importable so tests and oracles can
    replay it: every field is md5('synth:<i>') arithmetic."""
    import hashlib

    h = hashlib.md5(f"synth:{i}".encode()).hexdigest()
    return (
        i,
        _LANGS[int(h[:6], 16) % 5],
        20 + int(h[6:10], 16) % 481,
        int(h[10:16], 16) % 1000000,
    )


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        if self.n <= 0:
            # An empty generator still needs ONE (empty) partition:
            # range(0, 0, 0) raises, and Spark requires >= 1 split.
            return [InputPartition((0, 0))]
        per = (self.n + self.parts - 1) // self.parts
        return [
            InputPartition((lo, min(lo + per, self.n)))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_doc_row(i)


class SynthDocsDataSource(DataSource):
    """spark.read.format("graft_synth_docs").option("n", ...)"""

    @classmethod
    def name(cls) -> str:
        return "graft_synth_docs"

    def schema(self) -> str:
        return SYNTH_DOCS_SCHEMA

    def reader(self, schema):
        return SynthDocsReader(self.options)


class SynthDocsPushReader(DataSourceReader):
    """Pushdown-capable variant of SynthDocsReader (Spark 4.1's
    Python Data Source filter pushdown, SPARK-50556): the planner
    hands pushFilters the conjunctive filter list, the reader KEEPS
    the ones the backing source can evaluate natively and yields the
    rest back for Spark to re-check.

    Two pushdown tiers, mirroring what a real connector does:
    - doc_id range filters (>=, >, <, <=) prune PARTITIONS: only
      generator slices overlapping the residual [lo, hi) range are
      declared, so pruned slices are never scheduled (a database
      connector turns these into WHERE-clause shards; asserted via
      getNumPartitions in tests).
    - lang equality/IN filters apply per row inside read() — the
      "native WHERE" a database would evaluate server-side; rows
      that fail never cross the Python->JVM boundary.

    Requires spark.sql.python.filterPushdown.enabled=true — Spark
    REFUSES to plan a reader that implements pushFilters while the
    flag is off (clear AnalysisException), so the q113 lane and its
    tests arm the conf explicitly.
    """

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.lo = 0
        self.hi = self.n
        self.langs: set | None = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",) and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif attr == ("doc_id",) and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif attr == ("doc_id",) and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif attr == ("doc_id",) and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif attr == ("lang",) and isinstance(f, EqualTo):
                self.langs = {f.value} if self.langs is None else (
                    self.langs & {f.value}
                )
            elif attr == ("lang",) and isinstance(f, In):
                vals = set(f.value)
                self.langs = vals if self.langs is None else (
                    self.langs & vals
                )
            elif isinstance(f, IsNotNull):
                # generated columns are never NULL — absorb for free
                pass
            else:
                yield f  # unsupported: Spark re-evaluates it

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [InputPartition((0, 0))]
        per = (self.n + self.parts - 1) // self.parts
        out = []
        for slice_lo in range(0, self.n, per):
            slice_hi = min(slice_lo + per, self.n)
            # declare only slices overlapping the pushed range
            if slice_hi > lo and slice_lo < hi:
                out.append(
                    InputPartition((max(slice_lo, lo), min(slice_hi, hi)))
                )
        return out or [InputPartition((0, 0))]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            row = synth_doc_row(i)
            if self.langs is not None and row[1] not in self.langs:
                continue
            yield row


class SynthDocsPushDataSource(DataSource):
    """spark.read.format("graft_synth_docs_push") — pushdown variant.

    A SEPARATE source class on purpose: any reader that implements
    pushFilters fails to plan when the filterPushdown conf is off, so
    the baseline source (q105/st33's) must not grow the method."""

    @classmethod
    def name(cls) -> str:
        return "graft_synth_docs_push"

    def schema(self) -> str:
        return SYNTH_DOCS_SCHEMA

    def reader(self, schema):
        return SynthDocsPushReader(self.options)


def register_python_sources(spark: SparkSession) -> None:
    """Idempotent registration of the engine's Python data sources."""
    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(SynthDocsPushDataSource)
    spark.dataSource.register(SynthEventsStreamDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


SYNTH_EVENTS_SCHEMA = "event_id BIGINT, bucket BIGINT, cents BIGINT"


def synth_event_row(i: int) -> tuple:
    """The stream generator kernel, importable so tests replay the
    exact rows the source emitted: md5('sev:<i>') arithmetic."""
    import hashlib

    h = hashlib.md5(f"sev:{i}".encode()).hexdigest()
    return (i, int(h[:6], 16) % 5, int(h[6:12], 16) % 100000)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Deterministic micro-batch stream: offset = the next row index;
    each trigger emits up to rows_per_batch rows until stop_at.
    readBetweenOffsets replays any committed range exactly (the
    recovery contract: a restarted query re-reads the uncommitted
    range and gets the SAME rows)."""

    def __init__(self, options: dict):
        self.rate = int(options.get("rows_per_batch", 20))
        self.stop_at = int(options.get("stop_at", 200))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = min(lo + self.rate, self.stop_at)
        return (
            iter([synth_event_row(i) for i in range(lo, hi)]),
            {"i": hi},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            [synth_event_row(i) for i in range(start["i"], end["i"])]
        )


class SynthEventsStreamDataSource(DataSource):
    """spark.readStream.format("graft_synth_stream")... — the
    STREAMING half of the Python Data Source API: a deterministic
    replayable event feed for simulation and streaming tests at any
    rate, with exact offset-range replay for checkpoint recovery."""

    @classmethod
    def name(cls) -> str:
        return "graft_synth_stream"

    def schema(self) -> str:
        return SYNTH_EVENTS_SCHEMA

    def simpleStreamReader(self, schema):
        return SynthEventsStreamReader(self.options)


class JsonlCommitMessage(WriterCommitMessage):
    """Per-task commit message for the JSONL sink: where the task's
    staged file landed and what it holds. Must stay picklable (it
    rides the executor -> driver commit channel)."""

    def __init__(self, tmp_path: str, n_rows: int, partition_id: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows
        self.partition_id = partition_id


class JsonlStreamWriter(DataSourceStreamWriter):
    """st41: Python Data Source STREAMING SINK with a two-phase
    commit — the write-side twin of st33's replayable stream reader,
    and the file-sink transaction protocol in miniature:

    - write() (executors): each task stages its partition's rows to a
      DOT-PREFIXED temp file and returns a commit message; staged
      files are invisible to any reader that honors the manifest (or
      even a plain glob that skips dotfiles).
    - commit() (driver, once per epoch): renames every staged file to
      its DETERMINISTIC final name `batch-<id>-p<partition>.jsonl`
      and writes `_manifests/batch-<id>.json` (itself staged +
      os.replace'd, so the manifest is atomic). Exactly-once comes
      from idempotence: a replayed epoch re-stages, re-renames onto
      the SAME final names, and rewrites the same manifest — no
      duplicates, by construction rather than by dedup.
    - abort() (driver): deletes the staged files; committed batches
      are untouched.

    Readers consume manifests, never directory listings — the same
    contract Spark's own file sink implements with _spark_metadata.
    """

    def __init__(self, options: dict):
        import uuid

        self.path = options["path"]
        # per-writer-instance ownership token (driver-generated, rides
        # to executors via pickle): the single-writer contract's loud
        # half. First commit ASSERTS ownership (so a checkpoint
        # restart — a new instance over a dead predecessor — takes
        # over cleanly); any later commit that finds the owner file
        # changed means a SECOND live query is writing here, and this
        # writer fails loudly instead of silently sweeping its rival's
        # in-flight files.
        self.token = uuid.uuid4().hex
        self._owner_asserted = False

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f".staged-{uuid.uuid4().hex}-p{pid}.jsonl"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommitMessage(tmp, n, pid)

    def commit(self, messages, batchId):
        import json
        import os

        # ownership check BEFORE any rename/sweep: _writer_owner holds
        # the live writer's token. First commit takes over (restart
        # over a dead predecessor); a mismatch on a LATER commit means
        # a second query asserted ownership mid-run — fail loudly, the
        # rival keeps the directory, nothing of its state is touched.
        owner = os.path.join(self.path, "_writer_owner")
        takeover = not self._owner_asserted
        if self._owner_asserted:
            try:
                with open(owner) as f:
                    current = f.read()
            except OSError:
                current = ""
            if current != self.token:
                raise RuntimeError(
                    f"graft_jsonl_sink single-writer violation at "
                    f"{self.path}: another streaming query took "
                    f"ownership (owner token {current[:8]!r} != this "
                    f"writer's {self.token[:8]!r}); one sink dir, one "
                    f"query"
                )
        else:
            # Takeover is RESTART semantics: a fresh writer instance
            # cannot distinguish a dead predecessor (the legitimate
            # case) from a live rival misconfigured onto the same
            # path — the deterministic batch-file names make a
            # restart's replay idempotent, and that same mechanism
            # means a true rival's first commit overwrites batches it
            # shares ids with. What the protocol guarantees is that
            # the CONTESTED state cannot persist: the established
            # writer's next commit fails loudly (above) instead of
            # the two queries silently interleaving forever.
            os.makedirs(self.path, exist_ok=True)
            tmp_owner = owner + f".{self.token}.tmp"
            with open(tmp_owner, "w") as f:
                f.write(self.token)
            os.replace(tmp_owner, owner)
            self._owner_asserted = True

        entries = []
        for m in messages:
            if m is None:
                continue
            final = os.path.join(
                self.path, f"batch-{batchId:05d}-p{m.partition_id}.jsonl"
            )
            os.replace(m.tmp_path, final)
            entries.append(
                {"file": os.path.basename(final), "rows": m.n_rows}
            )
        # Garbage sweep: every message's staged file was just renamed,
        # so any .staged-* still present is an orphan (failed/retried
        # task attempt, or a crashed earlier epoch whose abort never
        # ran) — it can never be referenced by any manifest, and
        # without the sweep orphans accumulate forever in a
        # long-running stream. POSIX unlink is safe even against a
        # straggling speculative attempt still holding the fd open.
        # SKIPPED on the takeover commit: if the "predecessor" is in
        # fact a live rival, its in-flight staged files survive until
        # its own commit raises the single-writer violation — nothing
        # of the contested state is silently destroyed, and a real
        # predecessor's orphans are cleared one commit later.
        if not takeover:
            for leftover in os.listdir(self.path):
                if leftover.startswith(".staged-") and leftover.endswith(
                    ".jsonl"
                ):
                    try:
                        os.remove(os.path.join(self.path, leftover))
                    except OSError:
                        pass
        mdir = os.path.join(self.path, "_manifests")
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".batch-{batchId:05d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"batch_id": batchId, "files": sorted(entries, key=lambda e: e["file"])},
                f,
            )
        os.replace(tmp, os.path.join(mdir, f"batch-{batchId:05d}.json"))

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class JsonlSinkDataSource(DataSource):
    """df.writeStream.format("graft_jsonl_sink").option("path", ...)
    — the user-extensible streaming SINK half of the Python Data
    Source API (no JVM jar, full commit protocol)."""

    @classmethod
    def name(cls) -> str:
        return "graft_jsonl_sink"

    def streamWriter(self, schema, overwrite):
        return JsonlStreamWriter(self.options)


def read_jsonl_sink(spark: SparkSession, path: str, schema) -> "DataFrame":
    """Manifest-honoring reader for graft_jsonl_sink output: loads
    ONLY the files the committed manifests list (staged leftovers
    from a crashed epoch are invisible — the sink's read contract)."""
    import json
    import os

    mdir = os.path.join(path, "_manifests")
    files = []
    if os.path.isdir(mdir):
        for mf in sorted(os.listdir(mdir)):
            if mf.endswith(".json"):
                with open(os.path.join(mdir, mf)) as f:
                    manifest = json.load(f)
                files += [
                    os.path.join(path, e["file"]) for e in manifest["files"]
                ]
    # the commit protocol renames data BEFORE writing the manifest, so
    # a manifest-listed file that is missing is always corruption —
    # raise loudly rather than return a silently truncated frame
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"jsonl sink at {path}: manifest lists files that are "
            f"missing on disk (data loss): {missing[:5]}"
        )
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
