"""Custom Python DataSource WRITER: batched append sink with per-batch
error isolation.

The reference's sink slices rows into BATCH_SIZE chunks, inserts chunk by
chunk, logs failed chunks and keeps going, and sleeps between chunks
(etl_service/main.py:231-254: batching :240-241, insert :243,
error-continue :244-250, throttle :252-253). This writer re-expresses that
contract on Spark's DataSourceWriter API:

* each task slices ITS partition into ``batch_size`` chunks (the unit of
  commit against the remote sink -- here, one JSON-lines file per chunk),
* a chunk that fails is recorded in the commit message and SKIPPED, never
  aborting the task (the reference's error-continue), unless
  ``fail_fast=true``,
* optional ``throttle_ms`` between chunks (the reference's rate limit),
* ``commit()`` on the driver aggregates per-task messages into a
  _SUCCESS-style manifest so partial failures are observable data, not
  silent loss.

At cluster scale each task streams its chunks independently -- the
reference's single-threaded 1000-rows-per-second ceiling becomes
tasks x batch throughput.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import Row, StructType


@dataclass
class _BatchCommit(WriterCommitMessage):
    files: tuple
    rows_written: int
    batches_failed: int


class BatchedSinkWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.batch_size = int(options.get("batch_size", "1000"))
        self.throttle_ms = int(options.get("throttle_ms", "0"))
        self.fail_fast = options.get("fail_fast", "false").lower() == "true"
        # test hook: fail every Nth batch to exercise error isolation
        self.fail_every = int(options.get("fail_every_nth_batch", "0"))

    def write(self, rows: Iterator[Row]) -> _BatchCommit:
        os.makedirs(self.path, exist_ok=True)
        files: list[str] = []
        written = 0
        failed = 0
        batch: list[dict] = []
        batch_no = 0

        def flush(b: list[dict], n: int) -> None:
            nonlocal written, failed
            if not b:
                return
            try:
                if self.fail_every and (n + 1) % self.fail_every == 0:
                    raise IOError(f"injected failure for batch {n}")
                name = f"part-{uuid.uuid4().hex}-{n:05d}.jsonl"
                tmp = os.path.join(self.path, f".{name}.tmp")
                with open(tmp, "w") as f:
                    for r in b:
                        f.write(json.dumps(r, default=str) + "\n")
                os.rename(tmp, os.path.join(self.path, name))
                files.append(name)
                written += len(b)
            except Exception:
                if self.fail_fast:
                    raise
                failed += 1  # error-continue: record, skip, keep going
            if self.throttle_ms:
                time.sleep(self.throttle_ms / 1000.0)

        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= self.batch_size:
                flush(batch, batch_no)
                batch, batch_no = [], batch_no + 1
        flush(batch, batch_no)
        return _BatchCommit(tuple(files), written, failed)

    def commit(self, messages: list[_BatchCommit]) -> None:
        manifest = {
            "rows_written": sum(m.rows_written for m in messages),
            "batches_failed": sum(m.batches_failed for m in messages),
            "files": sorted(f for m in messages for f in m.files),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages: list[_BatchCommit]) -> None:
        pass  # tmp files never renamed are ignorable garbage


class BatchedSinkDataSource(DataSource):
    """``df.write.format("batched_sink").option("path", ...).save()``."""

    @classmethod
    def name(cls) -> str:
        return "batched_sink"

    def schema(self) -> StructType:  # writer-only source
        return StructType([])

    def writer(self, schema: StructType, overwrite: bool) -> BatchedSinkWriter:
        return BatchedSinkWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(BatchedSinkDataSource)
