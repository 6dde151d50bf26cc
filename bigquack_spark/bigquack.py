"""Facade mirroring the reference's public API surface, name for name.

A user of TFMV/BigQuack holds one ``BigQuack`` handle (bigquack.go:25-30)
and calls: ``BQ2Duck`` (bigquack.go:64), ``Query``/``Exec`` via the DuckDB
conn (duck.go:173-206), ``QueryProto`` (duck.go:274), ``IngestCreateAppend``
(duck.go:217), ``NewBigQueryReader`` (bigquery.go:65), and the managed
record writer (bigquery_write.go:327).  This class exposes the same verbs on
Spark so switching is a rename, not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigquack_spark.codec import encode_rows
from bigquack_spark.engine import Engine
from bigquack_spark.pipeline import transfer
from bigquack_spark.session import get_spark
from bigquack_spark.sinks.atomic import AtomicWriter, WriteStreamType
from bigquack_spark.sources.reader import Reader


class BigQuackSpark:
    """``NewBigQuack(ctx, duckDBPath, opts...)`` ≅ ``BigQuackSpark()``.

    The single engine handle: construction builds (or adopts) the
    SparkSession exactly as the reference builds its DuckDB conn + BigQuery
    client pair (bigquack.go:32-55).
    """

    def __init__(self, spark: SparkSession | None = None, **session_kwargs):
        self.spark = spark or get_spark(**session_kwargs)
        self._engine = Engine(self.spark)

    # -- bigquack.go:64-141 ---------------------------------------------------
    def bq2duck(
        self,
        source_location: str,
        source_table: str,
        target_table: str,
        columns: list[str] | None = None,
        predicate: str | None = None,
        max_streams: int | None = None,
        fmt: str = "parquet",
    ) -> int:
        """End-to-end transfer; returns rows ingested (BQ2Duck contract)."""
        return transfer(
            self.spark, source_location, source_table, target_table,
            columns=columns, predicate=predicate, max_streams=max_streams, fmt=fmt,
        )

    # -- duck.go:190-206 ------------------------------------------------------
    def query(self, sql: str) -> DataFrame:
        return self._engine.query(sql)

    # -- duck.go:173-185 ------------------------------------------------------
    def exec(self, sql: str) -> int:
        return self._engine.exec(sql)

    # -- duck.go:274-317 ------------------------------------------------------
    def query_proto(self, sql: str) -> DataFrame:
        """SQL -> one encoded document per row (QueryProto analogue; JSON
        codec, see bigquack_spark.codec for the descriptor discussion)."""
        return encode_rows(self._engine.query(sql))

    # -- duck.go:214-252 ------------------------------------------------------
    def ingest_create_append(self, table: str, df: DataFrame) -> None:
        self._engine.ingest_create_append(table, df)

    # -- bigquery.go:65-129 ---------------------------------------------------
    def new_reader(
        self,
        location: str,
        table: str,
        columns: list[str] | None = None,
        predicate: str | None = None,
        max_streams: int | None = None,
        fmt: str = "parquet",
    ) -> Reader:
        return Reader(
            self.spark, location, table,
            selected_fields=columns, row_restriction=predicate,
            max_streams=max_streams, fmt=fmt,
        )

    # -- bigquery_write.go:327-418 --------------------------------------------
    def new_managed_writer(
        self, target: str, stream_type: WriteStreamType = WriteStreamType.PENDING
    ) -> AtomicWriter:
        return AtomicWriter(target, stream_type)

    def close(self) -> None:
        """bigquack.go Close: the reference tears down conn+clients; the
        SparkSession is shared/singleton so this is deliberately a no-op
        unless the caller owns the session."""
