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


# ------------------------------------------------- OCF <-> DataFrames

_LOGICAL_SPARK = {
    ("long", "timestamp-micros"): T.TimestampType(),
    ("long", "timestamp-millis"): T.TimestampType(),
    ("int", "date"): T.DateType(),
}

_AVRO_PRIM_SPARK = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
}


def _spark_type(avro_t: Any) -> tuple[T.DataType, bool]:
    """Avro type -> (Spark type, nullable). Inverse of ``_avro_type``;
    unions beyond ["null", X] have no Spark analog and raise."""
    if isinstance(avro_t, list):
        branches = [b for b in avro_t if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"union {avro_t!r} has no Spark analog")
        inner, _ = _spark_type(branches[0])
        return inner, True
    if isinstance(avro_t, str):
        return _AVRO_PRIM_SPARK[avro_t], False
    t = avro_t["type"]
    logical = _LOGICAL_SPARK.get((t, avro_t.get("logicalType")))
    if logical is not None:
        return logical, False
    if t in _AVRO_PRIM_SPARK:
        return _AVRO_PRIM_SPARK[t], False
    if t in ("enum",):
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    if t == "array":
        inner, null = _spark_type(avro_t["items"])
        return T.ArrayType(inner, null), False
    if t == "map":
        inner, null = _spark_type(avro_t["values"])
        return T.MapType(T.StringType(), inner, null), False
    if t == "record":
        return struct_of_avro(avro_t), False
    raise ValueError(f"no Spark mapping for Avro type {avro_t!r}")


def struct_of_avro(schema: Any) -> T.StructType:
    """Avro record schema -> Spark StructType (the read-side inverse of
    :func:`avro_schema_of`)."""
    schema = avro_min._schema(schema)
    fields = []
    for f in schema["fields"]:
        dt, nullable = _spark_type(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


def _bridge_from_avro(avro_t: Any, v: Any) -> Any:
    """Decoded value -> Arrow-friendly value, driven by the WRITER's
    Avro schema so logical-type units (millis vs micros) are honored."""
    import pandas as pd

    if v is None:
        return None
    if isinstance(avro_t, list):
        branches = [b for b in avro_t if b != "null"]
        return _bridge_from_avro(branches[0], v)
    if isinstance(avro_t, dict):
        t, logical = avro_t["type"], avro_t.get("logicalType")
        if (t, logical) == ("long", "timestamp-micros"):
            return pd.Timestamp(v, unit="us")
        if (t, logical) == ("long", "timestamp-millis"):
            return pd.Timestamp(v, unit="ms")
        if (t, logical) == ("int", "date"):
            return (pd.Timestamp("1970-01-01") + pd.Timedelta(days=v)).date()
        if t == "array":
            return [_bridge_from_avro(avro_t["items"], x) for x in v]
        if t == "map":
            return {k: _bridge_from_avro(avro_t["values"], x) for k, x in v.items()}
        if t == "record":
            return {
                f["name"]: _bridge_from_avro(f["type"], v.get(f["name"]))
                for f in avro_t["fields"]
            }
    return v


def ocf_header_schema(payload: bytes) -> Any:
    """Parse just the OCF header and return the writer schema (cheap:
    metadata map only, no blocks)."""
    import json as _json

    r = avro_min._Reader(bytes(payload))
    if r.read(4) != avro_min.OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    meta = avro_min._decode(r, avro_min._META_SCHEMA)
    return _json.loads(meta["avro.schema"].decode("utf-8"))


def read_avro_ocf(spark, path: str, reader_schema: Any = None) -> DataFrame:
    """Read .avro Object Container Files into a typed DataFrame without
    the spark-avro jar: ``binaryFile`` source (one task per file) ->
    pure-Python block decode -> Arrow batches. Without ``reader_schema``
    the result schema derives from the FIRST file's writer schema and
    files whose schema differs in canonical form fail loudly; WITH it,
    every file resolves into that shape (mixed producer generations in
    one directory). Whole files load per task — the jar tier remains
    the choice for multi-GB OCFs."""
    files = spark.read.format("binaryFile").load(path)
    resolve = reader_schema is not None
    if not resolve:
        first = files.select("content").first()
        if first is None:
            raise ValueError(f"no files matched {path!r}")
        reader_schema = ocf_header_schema(bytes(first[0]))
    else:
        reader_schema = avro_min._schema(reader_schema)
    reader_cf = avro_min.canonical_form(reader_schema)
    struct = struct_of_avro(reader_schema)
    names = [f.name for f in struct.fields]
    int_cols = {
        f.name: "Int32"
        for f in struct.fields
        if isinstance(f.dataType, (T.IntegerType, T.ShortType, T.ByteType))
    } | {
        f.name: "Int64"
        for f in struct.fields
        if isinstance(f.dataType, T.LongType)
    }

    def dec(batches):
        import pandas as pd

        for pdf in batches:
            for payload in pdf["content"]:
                if resolve:
                    _, records = avro_min.read_ocf(
                        bytes(payload), reader_schema=reader_schema
                    )
                else:
                    schema, records = avro_min.read_ocf(bytes(payload))
                    if avro_min.canonical_form(schema) != reader_cf:
                        raise ValueError(
                            "OCF writer schema differs across files; "
                            "pass reader_schema= to resolve them into one shape"
                        )
                rows = [
                    {
                        f["name"]: _bridge_from_avro(f["type"], rec.get(f["name"]))
                        for f in reader_schema["fields"]
                    }
                    for rec in records
                ]
                out = pd.DataFrame(rows, columns=names)
                for col, dtype in int_cols.items():
                    out[col] = out[col].astype(dtype)
                yield out

    return files.select("content").mapInPandas(dec, schema=struct)


def write_avro_ocf(
    df: DataFrame, directory: str, codec: str = "deflate"
) -> DataFrame:
    """Write ``df`` as one .avro OCF per partition under ``directory``
    (shared/posix filesystem; the spark-avro jar is the tier for object
    stores). Returns a small (file, records) DataFrame for audit.
    Distributed: each task serializes only its own partition."""
    import os

    struct = df.schema
    schema = avro_schema_of(struct, name="Row")
    fields = struct.fields
    os.makedirs(directory, exist_ok=True)

    def enc(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        records = []
        for pdf in batches:
            for i in range(len(pdf)):
                records.append(
                    {
                        f.name: _to_avro_value(f.dataType, pdf[f.name].iat[i])
                        for f in fields
                    }
                )
        out_path = os.path.join(directory, f"part-{pid:05d}.avro")
        with open(out_path, "wb") as fh:
            fh.write(avro_min.write_ocf(schema, records, codec=codec))
        yield pd.DataFrame({"file": [out_path], "records": [len(records)]})

    return df.mapInPandas(enc, schema="file string, records long")


# ------------------------------------------------ catalog egress/ingress


def export_tables_ocf(
    spark, sf_dir: str, out_dir: str, tables: tuple[str, ...] | None = None
) -> dict[str, int]:
    """Egress the warehouse catalog as .avro container files (one
    subdirectory of per-partition OCFs per table) — the jar-less
    backup/interchange path. Returns {table: row_count written}."""
    import os

    from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES, load_table

    counts: dict[str, int] = {}
    for name in tables or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        manifest = write_avro_ocf(df, os.path.join(out_dir, name)).collect()
        counts[name] = sum(r.records for r in manifest)
    return counts


def import_tables_ocf(
    spark, in_dir: str, tables: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Read an ``export_tables_ocf`` directory back into typed
    DataFrames keyed by table name (schemas come from the file
    headers)."""
    import os

    from end2end_data_pipeline_spark.sources.tables import TABLE_NAMES

    names = tables or tuple(
        t for t in TABLE_NAMES if os.path.isdir(os.path.join(in_dir, t))
    )
    return {name: read_avro_ocf(spark, os.path.join(in_dir, name)) for name in names}
