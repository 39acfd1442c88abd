"""Custom Python data source (Spark 4 DataSource API, SPARK-44076): a
deterministic synthetic event generator exposed as a first-class
``spark.read.format(...)`` source with partition-parallel reads.

Why it exists here: the engine's other sources wrap files and transports;
this demonstrates the remaining ingestion surface — a PYTHON-defined
DataSourceV2 — while staying inside the repo's differential-testing bar:
every generated cell derives from pure integer arithmetic on the row index
(Knuth multiplicative hash), so a DuckDB ``range()`` query reproduces the
whole table bit-for-bit and the source itself is value-hash checked like
any operator.

Scale: ``partitions()`` splits the index space, each worker generates its
slice independently (no driver data, no skew); at 100 TB this is the shape
of any partition-parallel connector — the per-partition iterator is the
only Python cost, and a generator source is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

KNUTH = 2654435761  # golden-ratio multiplicative constant (public domain)
N_USERS = 150
N_TYPES = 5
TYPES = ("view", "click", "purchase", "scroll", "error")
BASE_EPOCH_S = 1_700_000_000  # 2023-11-14T22:13:20Z


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "10000"))
        self.n_partitions = int(options.get("partitions", "8"))

    def partitions(self):
        step = max(1, (self.n + self.n_partitions - 1) // self.n_partitions)
        return [_Slice(i, min(i + step, self.n)) for i in range(0, self.n, step)]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            h = (i * KNUTH) % (1 << 31)
            yield (
                i,                                   # event_id
                BASE_EPOCH_S + i,                    # ts_epoch_s
                h % N_USERS,                         # user_id
                TYPES[h % N_TYPES],                  # event_type
                (h % 10_000) / 100.0,                # value (exact /100 of int)
            )


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events").option("n", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, ts_epoch_s bigint, user_id bigint, event_type string, value double"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched twin of the batch reader: offsets are plain row
    indices, each ``read`` advances by ``batch`` rows until ``n``, and
    ``readBetweenOffsets`` replays any committed range deterministically —
    the replayability contract exactly-once sinks rely on. Row content is
    the SAME integer arithmetic as the batch reader, so one DuckDB oracle
    checks both and the stream==batch differential is free."""

    def __init__(self, options):
        self.n = int(options.get("n", "10000"))
        self.batch = int(options.get("batch", "2500"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, start: int, end: int):
        # materialized, not a generator: the stream runner's prefetch
        # PICKLES the returned iterator (generators are unpicklable)
        out = []
        for i in range(start, end):
            h = (i * KNUTH) % (1 << 31)
            out.append(
                (
                    i,
                    BASE_EPOCH_S + i,
                    h % N_USERS,
                    TYPES[h % N_TYPES],
                    (h % 10_000) / 100.0,
                )
            )
        return iter(out)

    def read(self, start: dict):
        i = start["i"]
        end = min(i + self.batch, self.n)
        return self._rows(i, end), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["i"], end["i"])

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsStreamSource(DataSource):
    """``spark.readStream.format("synthetic_events_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id bigint, ts_epoch_s bigint, user_id bigint, event_type string, value double"

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_stream_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsStreamSource)


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path, self.n = path, n


class JsonlStreamWriter(DataSourceStreamWriter):
    """Custom Python STREAMING SINK with two-phase commit discipline: each
    task writes its partition to a uniquely-named staging file and returns
    a commit message; ``commit`` atomically renames the batch's staged
    files into the output dir (suffix ``.jsonl``) and appends a batch
    manifest line; ``abort`` deletes the staged files. A retried/aborted
    task therefore never leaves half-written visible output — the
    exactly-once-per-batch contract every real sink (foreachBatch MERGE,
    Kafka transactional producer) implements, here exercised through the
    Spark 4 Python DataSource write path."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        fname = os.path.join(self.path, "_staging", uuid.uuid4().hex)
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True, default=str) + "\n")
                n += 1
        return _FileCommit(fname, n)

    def commit(self, messages, batchId) -> None:
        """Replay-idempotent (ADVICE r5): a driver crash mid-commit makes the
        engine re-run write+commit for the same batchId, so commit (a) sweeps
        staging files that are not part of THIS commit (micro-batches run
        sequentially per query, so anything else staged is a dead prior
        attempt), (b) drops visible files a crashed attempt already renamed
        for this batch, and (c) records the batch total as ONE PER-BATCH
        manifest file (`_manifest.d/b-<batchId>`) published via temp+rename —
        a replay atomically overwrites the same file, so totals are never
        double-counted, the manifest is never torn, and commit cost stays
        O(this batch) instead of rewriting an ever-growing single file
        (O(total batches) per commit)."""
        import os

        keep = {m.path for m in messages if m is not None}
        staging_dir = os.path.join(self.path, "_staging")
        if os.path.isdir(staging_dir):
            for f in os.listdir(staging_dir):
                p = os.path.join(staging_dir, f)
                if p not in keep:
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        pass
        prefix = f"batch-{batchId:05d}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix) and f.endswith(".jsonl"):
                os.remove(os.path.join(self.path, f))
        total = 0
        for i, m in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.path, f"batch-{batchId:05d}-{i:04d}.jsonl")
            os.replace(m.path, final)
            total += m.n
        manifest_dir = os.path.join(self.path, "_manifest.d")
        os.makedirs(manifest_dir, exist_ok=True)
        entry = os.path.join(manifest_dir, f"b-{batchId:05d}")
        tmp = entry + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{batchId}\t{total}\n")
        os.replace(tmp, entry)

    @staticmethod
    def read_manifest(path: str) -> list[tuple[int, int]]:
        """(batchId, rows) per committed batch, sorted — the audit view the
        tests and any consumer use instead of parsing the directory."""
        import os

        manifest_dir = os.path.join(path, "_manifest.d")
        out = []
        if os.path.isdir(manifest_dir):
            for f in os.listdir(manifest_dir):
                if f.startswith("b-") and not f.endswith(".tmp"):
                    with open(os.path.join(manifest_dir, f)) as fh:
                        b, n = fh.read().split("\t")
                        out.append((int(b), int(n)))
        # Sort by the parsed integer batchId, not the filename: the zero
        # padding in b-{batchId:05d} overflows at 100000 and lexicographic
        # order would put b-100000 before b-99999.
        out.sort()
        return out

    def abort(self, messages, batchId) -> None:
        import os

        for m in (m for m in messages if m is not None):
            try:
                os.remove(m.path)
            except FileNotFoundError:
                pass


class JsonlSinkSource(DataSource):
    """``df.writeStream.format("jsonl_sink").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def streamWriter(self, schema, overwrite: bool):
        return JsonlStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkSource)
