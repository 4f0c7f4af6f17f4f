"""Generic DataFrame <-> Avro-binary frames over any Spark schema.

``connectors.encode_events_avro_py`` handles the one hard-coded event
contract; this module generalizes the serde tier to ANY table the
engine serves (the reference's registry holds one subject per topic —
``producer/schema_registry.py:13-30`` — but a warehouse egress needs
every table expressible): derive the Avro record schema mechanically
from the Spark ``StructType``, then encode/decode whole DataFrames
through Arrow-batched ``mapInPandas`` with ``sources/avro_min.py``.

Type mapping (Spark -> Avro, per the public spark-avro converter
semantics): string->string, int/short/byte->int, long->long,
float->float, double->double, boolean->boolean, binary->bytes,
timestamp->long/timestamp-micros, date->int/date, array->array,
map(string,V)->map, struct->record; a nullable field becomes the
union ["null", T] with null default.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from end2end_data_pipeline_spark.sources import avro_min

_PRIMITIVE = {
    T.StringType: "string",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_type(dt: T.DataType, name: str) -> Any:
    prim = _PRIMITIVE.get(type(dt))
    if prim is not None:
        return prim
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _field_type(dt.elementType, dt.containsNull, name)}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        return {
            "type": "map",
            "values": _field_type(dt.valueType, dt.valueContainsNull, name),
        }
    if isinstance(dt, T.StructType):
        return avro_schema_of(dt, name=f"{name}_rec")
    raise ValueError(f"no Avro mapping for Spark type {dt.simpleString()}")


def _field_type(dt: T.DataType, nullable: bool, name: str) -> Any:
    avro_t = _avro_type(dt, name)
    return ["null", avro_t] if nullable else avro_t


def avro_schema_of(struct: T.StructType, name: str = "Record") -> dict:
    """Mechanical StructType -> Avro record schema derivation."""
    fields = []
    for f in struct.fields:
        entry: dict[str, Any] = {
            "name": f.name,
            "type": _field_type(f.dataType, f.nullable, f.name),
        }
        if f.nullable:
            entry["default"] = None
        fields.append(entry)
    return {"type": "record", "name": name, "fields": fields}


# ------------------------------------------------------- value bridges


def _to_avro_value(dt: T.DataType, v: Any) -> Any:
    """Pandas/numpy cell -> plain Python value the codec accepts."""
    import pandas as pd

    if v is None:
        return None
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
        # non-scalars: pd.isna would vectorize; None check above suffices
        pass
    elif pd.isna(v):
        return None
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType, T.LongType)):
        return int(v)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dt, T.BooleanType):
        return bool(v)
    if isinstance(dt, T.StringType):
        return str(v)
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    if isinstance(dt, T.TimestampType):
        return pd.Timestamp(v).value // 1_000  # ns -> micros
    if isinstance(dt, T.DateType):
        return (pd.Timestamp(v) - pd.Timestamp("1970-01-01")).days
    if isinstance(dt, T.ArrayType):
        return [_to_avro_value(dt.elementType, x) for x in v]
    if isinstance(dt, T.MapType):
        return {str(k): _to_avro_value(dt.valueType, x) for k, x in dict(v).items()}
    if isinstance(dt, T.StructType):
        d = v if isinstance(v, dict) else v.asDict()
        return {f.name: _to_avro_value(f.dataType, d.get(f.name)) for f in dt.fields}
    raise ValueError(f"no Avro bridge for Spark type {dt.simpleString()}")


def _from_avro_value(dt: T.DataType, v: Any) -> Any:
    """Decoded codec value -> what Arrow expects for this Spark type."""
    import pandas as pd

    if v is None:
        return None
    if isinstance(dt, T.TimestampType):
        return pd.Timestamp(v, unit="us")
    if isinstance(dt, T.DateType):
        return (pd.Timestamp("1970-01-01") + pd.Timedelta(days=v)).date()
    if isinstance(dt, T.ArrayType):
        return [_from_avro_value(dt.elementType, x) for x in v]
    if isinstance(dt, T.MapType):
        return {k: _from_avro_value(dt.valueType, x) for k, x in v.items()}
    if isinstance(dt, T.StructType):
        return {f.name: _from_avro_value(f.dataType, v.get(f.name)) for f in dt.fields}
    return v


def encode_df_avro(
    df: DataFrame, schema_id: int = 1, record_name: str = "Record"
) -> DataFrame:
    """Any DataFrame -> single-column Confluent-framed Avro frames.
    The Avro schema derives from ``df.schema``; register it (e.g. in a
    ``LocalSchemaRegistry``) under ``schema_id`` for consumers."""
    struct = df.schema
    schema = avro_schema_of(struct, name=record_name)
    fields = struct.fields

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            values = []
            for i in range(len(pdf)):
                rec = {
                    f.name: _to_avro_value(f.dataType, pdf[f.name].iat[i])
                    for f in fields
                }
                values.append(avro_min.frame(schema_id, avro_min.encode(schema, rec)))
            yield pd.DataFrame({"value": values})

    return df.mapInPandas(enc, schema="value binary")


def decode_df_avro(frames: DataFrame, struct: T.StructType) -> DataFrame:
    """Frames back to a typed DataFrame under ``struct`` (the reader
    schema; the writer schema is re-derived from it, so use
    ``avro_min.decode_resolved`` call sites for cross-version reads)."""
    schema = avro_schema_of(struct)
    fields = struct.fields

    def dec(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for payload in pdf["value"]:
                _, body = avro_min.unframe(bytes(payload))
                rec = avro_min.decode(schema, body)
                recs.append(
                    {f.name: _from_avro_value(f.dataType, rec[f.name]) for f in fields}
                )
            out = pd.DataFrame(recs, columns=[f.name for f in fields])
            for f in fields:
                # keep int columns integral under nulls (plain pandas
                # would float-ify them and Arrow refuses NaN -> int)
                if isinstance(f.dataType, (T.IntegerType, T.ShortType, T.ByteType)):
                    out[f.name] = out[f.name].astype("Int32")
                elif isinstance(f.dataType, T.LongType):
                    out[f.name] = out[f.name].astype("Int64")
            yield out

    return frames.mapInPandas(dec, schema=struct)
