"""Operational monitoring (A9): the opmon/ers metrics plane.

The reference streams operational metrics and error reports to CERN
Kafka sinks (``ers_impl``/``opmon_impl`` "cern",
config/base/iceberg_daq_eth.json:14,16) so every run is observable
after the fact.  The Spark-native analog is a
:class:`StreamingQueryListener` that captures every micro-batch
progress event - input rate, processing rate, watermark, state-store
size, batch duration - and lands it in an opmon
:class:`~iceberg_daq_spark.tablestore.MergeTable` keyed by
(query_id, run_id, batch_id), so redelivered progress events upsert
instead of duplicating.

Rows are buffered on the listener-bus thread and written to the table
in :meth:`OpmonMonitor.flush` (called from the query's owning thread
after ``awaitTermination``) - listener callbacks never run Spark jobs,
which keeps the bus non-blocking at any scale.  On a cluster the same
table is queryable mid-run from any session, like the reference's
Kafka topic.
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

from iceberg_daq_spark.tablestore import MergeTable

OPMON_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("event_ts", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_sec", T.DoubleType()),
        T.StructField("processed_rows_per_sec", T.DoubleType()),
        T.StructField("watermark", T.StringType()),
        T.StructField("state_rows", T.LongType()),
        T.StructField("batch_duration_ms", T.LongType()),
    ]
)


class _SocketEmitter:
    """Push transport twin of the reference's Kafka opmon producer
    (``opmon_impl``/``ers_impl`` "cern", iceberg_daq_eth.json:14-16;
    no broker in this container, so newline-delimited JSON over TCP).
    Best-effort like an async producer: ``emit`` only enqueues onto a
    bounded queue (full queue -> drop, counted in ``dropped``) and a
    daemon sender thread owns the socket, so a slow or half-open
    endpoint can never stall the listener bus and ``close`` cannot race
    an in-flight send."""

    _QUEUE_MAX = 1024

    def __init__(self, addr: tuple[str, int]):
        import queue

        self.addr = addr
        self.dropped = 0
        self._sock = None
        self._queue: "queue.Queue[dict | None]" = queue.Queue(self._QUEUE_MAX)
        self._thread = threading.Thread(
            target=self._drain, name="opmon-socket-emitter", daemon=True
        )
        self._thread.start()

    def emit(self, row: dict) -> None:
        import queue

        try:
            self._queue.put_nowait(row)
        except queue.Full:
            self.dropped += 1

    def _drain(self) -> None:
        import json
        import socket

        while True:
            row = self._queue.get()
            if row is None:
                break
            payload = (json.dumps(row) + "\n").encode("utf-8")
            # two attempts with a reconnect in between: a stale/half-open
            # socket or a slow accept (loaded host) costs a retry, not a
            # dropped row; still strictly bounded time per row
            for attempt in (0, 1):
                try:
                    if self._sock is None:
                        self._sock = socket.create_connection(
                            self.addr, timeout=5.0
                        )
                    self._sock.sendall(payload)
                    break
                except OSError:
                    self._close_sock()
                    if attempt:
                        self.dropped += 1
        self._close_sock()

    def _close_sock(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None

    def close(self, timeout: float = 5.0) -> None:
        """Flush the queue and stop the sender thread (sentinel after
        the queued rows, so everything enqueued before close drains)."""
        self._queue.put(None)
        self._thread.join(timeout)


class _KafkaEmitter:
    """The real Kafka transport (``opmon_impl`` "cern",
    iceberg_daq_eth.json:14-16): progress rows buffered on the bus
    thread, shipped from the owning thread as JSON values through
    Spark's Kafka sink (``format("kafka")``).  Selected whenever a
    broker URL is configured; this container has no broker (or Kafka
    connector jar), so ship() here can only be exercised for branch
    selection - on a cluster it is the one write call."""

    def __init__(self, spark: SparkSession, brokers: str, topic: str):
        self._spark = spark
        self.brokers = brokers
        self.topic = topic
        self._rows: list[dict] = []
        self._lock = threading.Lock()

    def emit(self, row: dict) -> None:
        with self._lock:
            self._rows.append(row)

    def payload_df(self, rows: list[dict]):
        """The exact DataFrame fed to ``format("kafka")``: the sink
        contract is two columns - ``key`` (partitioning key, here
        query_id/run_id/batch_id so redeliveries land in-order per
        query) and ``value`` (the progress row as JSON).  Split out
        from :meth:`ship` so the shape is testable in this
        broker-less container (the dry-run test the write itself
        cannot have here)."""
        from pyspark.sql import functions as F

        return self._spark.createDataFrame(rows, OPMON_SCHEMA).select(
            F.concat_ws("/", "query_id", "run_id", "batch_id").alias("key"),
            F.to_json(F.struct("*")).alias("value"),
        )

    def ship(self) -> int:
        """Write buffered rows to the topic; returns rows shipped.
        Runs on the owning thread (Spark actions are illegal on the
        listener bus)."""
        with self._lock:
            rows, self._rows = self._rows, []
        if not rows:
            return 0
        self._write(self.payload_df(rows))
        return len(rows)

    def _write(self, payload) -> None:
        """The terminal connector call - the ONLY line of this class
        that needs the Kafka jar + a broker.  Everything else (buffer
        drain semantics, key framing, JSON serialization) runs and is
        tested in this container through this seam
        (tests/test_streaming.py patches it to capture the payload);
        on a cluster this is the one write call."""
        (
            payload.write.format("kafka")
            .option("kafka.bootstrap.servers", self.brokers)
            .option("topic", self.topic)
            .save()
        )

    def close(self) -> None:
        pass


class OpmonMonitor(StreamingQueryListener):
    """Collects per-batch progress for every query on the session and
    upserts it into the opmon table on flush().  Push transport for A9
    parity (the table is the queryable store, the push feed is the
    pipe the reference's Kafka topic provides): with ``kafka_brokers``
    configured, progress rows ship through Spark's Kafka sink on
    flush(); otherwise with ``push_addr`` each row streams live as
    newline JSON over TCP (the no-broker container analog)."""

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        push_addr: tuple[str, int] | None = None,
        kafka_brokers: str | None = None,
        kafka_topic: str = "opmon",
    ):
        self._spark = spark
        self.table = MergeTable(
            table_dir, key_cols=("query_id", "run_id", "batch_id")
        )
        self._rows: list[dict] = []
        self._lock = threading.Lock()
        # broker configured -> the real Kafka branch wins
        self._emitter = (
            _KafkaEmitter(spark, kafka_brokers, kafka_topic)
            if kafka_brokers
            else _SocketEmitter(push_addr) if push_addr else None
        )

    # -- listener-bus callbacks (no Spark actions here) ----------------
    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = sum(op.numRowsTotal or 0 for op in (p.stateOperators or []))
        et = (p.eventTime or {}).get("watermark")
        row = {
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "query_name": p.name,
            "batch_id": int(p.batchId),
            "event_ts": p.timestamp,
            "num_input_rows": int(p.numInputRows or 0),
            "input_rows_per_sec": float(p.inputRowsPerSecond or 0.0),
            "processed_rows_per_sec": float(p.processedRowsPerSecond or 0.0),
            "watermark": et,
            "state_rows": int(state_rows),
            "batch_duration_ms": int((p.durationMs or {}).get("triggerExecution", 0)),
        }
        with self._lock:
            self._rows.append(row)
        if self._emitter is not None:
            self._emitter.emit(row)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    # -- owning-thread API --------------------------------------------
    def attach(self) -> "OpmonMonitor":
        self._spark.streams.addListener(self)
        return self

    def detach(self) -> None:
        self._spark.streams.removeListener(self)
        if self._emitter is not None:
            self._emitter.close()

    def flush(self):
        """Upsert buffered progress rows into the opmon table (and
        ship the Kafka buffer when that transport is selected); returns
        the table DataFrame (None if nothing has ever been flushed)."""
        with self._lock:
            rows, self._rows = self._rows, []
        if rows:
            self.table.merge(self._spark.createDataFrame(rows, OPMON_SCHEMA))
        if isinstance(self._emitter, _KafkaEmitter):
            self._emitter.ship()
        return self.table.read(self._spark)
