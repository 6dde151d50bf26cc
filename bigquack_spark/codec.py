"""Result-row encoding — the ``QueryProto`` analogue.

Reference (duck.go:274-317): run SQL, derive a descriptor from the Arrow
schema, serialize every result row as a dynamic protobuf message.  The
Spark-native equivalent keeps the encode distributed (a JVM expression per
row, never a driver loop): each row becomes one self-describing JSON document
via ``to_json(struct(*))``.  Where a real protobuf wire format is required,
``pyspark.sql.protobuf.functions.to_protobuf`` slots into the same shape —
it needs a compiled descriptor set, which the offline harness doesn't ship,
so JSON is the default codec (same role: schema-derived, row-level,
streamable).

Flat-schema limitation parity: the reference's descriptor converter rejects
nested fields (bigquery_write.go:279-282); JSON encoding has no such limit,
so ``strict_flat=True`` opts into the reference's gate when bug-for-bug
shape matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_rows(df: DataFrame, strict_flat: bool = False) -> DataFrame:
    """DataFrame -> single-column ``encoded`` DataFrame, one document per row
    (QueryProto analogue, duck.go:290-316)."""
    if strict_flat:
        nested = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
        ]
        if nested:
            # bigquery_write.go:279-282: nested fields unsupported in strict mode
            raise ValueError(f"nested fields not supported in flat encoding: {nested}")
    return df.select(F.to_json(F.struct(*df.columns)).alias("encoded"))


def decode_rows(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Inverse of :func:`encode_rows` — the round-trip used by the
    reference's proto tests (duck_test.go:254-294)."""
    return df.select(F.from_json("encoded", schema).alias("row")).select("row.*")


def encode_arrow_ipc(df: DataFrame) -> DataFrame:
    """Distributed Arrow IPC serialization — the wire format the reference
    writes per batch (bigquery_write.go:429-445: record -> IPC bytes for
    AppendRows).  ``mapInArrow`` hands each executor its columnar batches
    as ``pyarrow.RecordBatch`` (the literal ``arrow.Record`` analogue);
    each batch becomes one self-contained IPC stream (schema + batch) in a
    single ``ipc`` binary column.  No driver hop: a 100 TB export streams
    batch-by-batch from every executor, exactly like the reference's pump
    loop but in parallel."""

    def serialize(batches):
        import io

        import pyarrow as pa

        for b in batches:
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, b.schema) as w:
                w.write_batch(b)
            yield pa.RecordBatch.from_pydict({"ipc": [sink.getvalue()]})

    return df.mapInArrow(serialize, "ipc binary")


def decode_arrow_ipc(df: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Inverse of :func:`encode_arrow_ipc`: each ``ipc`` blob is opened as
    an IPC stream and its batches re-enter the plan columnar (the read-side
    schema-prepend decode of bigquery.go:215-239, minus the manual
    schema-bytes bookkeeping — IPC streams are self-describing)."""

    def deserialize(batches):
        import pyarrow as pa

        for b in batches:
            for blob in b.column("ipc").to_pylist():
                with pa.ipc.open_stream(blob) as r:
                    yield from r

    return df.mapInArrow(deserialize, schema)
