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
