"""Pure-stdlib Avro binary codec (spec subset) + Confluent wire framing.

The reference serializes events with Avro through a Confluent Schema
Registry before they reach Kafka (``producer/producer.py:100-105``,
``producer/schema_registry.py:13-30``). In this engine the production
deserializer is JVM-side ``from_avro`` (``connectors.read_kafka_events``),
but that jar is an add-on not bundled with the pyspark wheel — so, like
``functions/png_min.py`` for image decoding, this module implements the
serde itself from the public Avro 1.11 specification so the schema
contract is *executable and tested* in any environment, not merely
declared.

Scope (everything the event contract needs, plus the common composites):

- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record, enum, array, map, union, fixed
- logical type ``timestamp-millis`` passes through as long (the Spark
  glue in ``connectors.encode_events_avro_py`` / ``decode_events_avro_py``
  converts to/from TimestampType)
- schema resolution (reader vs writer evolution): skipped writer-only
  fields, defaulted reader-only fields, numeric and string/bytes
  promotions, union re-resolution, enum reader-default
- parsing canonical form + CRC-64-AVRO Rabin fingerprint (spec
  "Schema Fingerprints") for registry-free schema identity
- Confluent wire format: 1-byte magic 0x00 + 4-byte big-endian schema
  id + Avro binary body — byte-compatible with the ``substring(value,
  6)`` header strip the JVM reader applies

Encoding rules implemented (Avro spec, "Binary encoding"):
int/long are zigzag varints; bytes/string are long-prefixed; a union
writes the zigzag branch index then the value; arrays/maps write
blocks (count, items, then a 0 terminator); records write fields in
declaration order with no framing.
"""

from __future__ import annotations

import json
import struct
from typing import Any

PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}

INT_MIN, INT_MAX = -(2**31), 2**31 - 1
LONG_MIN, LONG_MAX = -(2**63), 2**63 - 1


def _schema(s: Any) -> Any:
    return json.loads(s) if isinstance(s, str) and s.lstrip().startswith(("{", "[")) else s


# ---------------------------------------------------------------- encode


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch for a Python value (null first, then the
    first type-compatible branch — enough for [null, X] contracts)."""
    for i, branch in enumerate(schema):
        t = branch if isinstance(branch, str) else branch.get("type")
        if value is None and t == "null":
            return i
        if value is None:
            continue
        if t == "boolean" and isinstance(value, bool):
            return i
        if t in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if t in ("float", "double") and isinstance(value, float):
            return i
        if t == "string" and isinstance(value, str):
            return i
        if t in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)):
            return i
        if t == "record" and isinstance(value, dict):
            return i
        if t == "array" and isinstance(value, list):
            return i
        if t == "map" and isinstance(value, dict):
            return i
        if t == "enum" and isinstance(value, str):
            return i
    raise ValueError(f"no union branch in {schema!r} accepts {value!r}")


def _encode(out: bytearray, schema: Any, value: Any) -> None:
    if isinstance(schema, list):  # union
        branch = _union_branch(schema, value)
        _write_varint(out, branch)
        _encode(out, schema[branch], value)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        if value is not None:
            raise ValueError(f"null schema got {value!r}")
        return
    if t == "boolean":
        out.append(1 if value else 0)
        return
    if t in ("int", "long"):
        lo, hi = (INT_MIN, INT_MAX) if t == "int" else (LONG_MIN, LONG_MAX)
        if not isinstance(value, int) or isinstance(value, bool) or not lo <= value <= hi:
            raise ValueError(f"{t} schema got {value!r}")
        _write_varint(out, value)
        return
    if t == "float":
        out += struct.pack("<f", value)
        return
    if t == "double":
        out += struct.pack("<d", value)
        return
    if t == "bytes":
        _write_varint(out, len(value))
        out += bytes(value)
        return
    if t == "string":
        raw = value.encode("utf-8")
        _write_varint(out, len(raw))
        out += raw
        return
    if t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError(f"fixed({schema['size']}) got {len(value)} bytes")
        out += bytes(value)
        return
    if t == "enum":
        _write_varint(out, schema["symbols"].index(value))
        return
    if t == "record":
        for f in schema["fields"]:
            try:
                _encode(out, f["type"], value[f["name"]])
            except KeyError:
                raise ValueError(f"record value missing field {f['name']!r}") from None
        return
    if t == "array":
        if value:
            _write_varint(out, len(value))
            for item in value:
                _encode(out, schema["items"], item)
        _write_varint(out, 0)
        return
    if t == "map":
        if value:
            _write_varint(out, len(value))
            for k, v in value.items():
                _encode(out, "string", k)
                _encode(out, schema["values"], v)
        _write_varint(out, 0)
        return
    raise ValueError(f"unsupported Avro type {t!r}")


def encode(schema: Any, value: Any) -> bytes:
    """Avro binary encoding of ``value`` under ``schema`` (dict or JSON)."""
    out = bytearray()
    _encode(out, _schema(schema), value)
    return bytes(out)


# ---------------------------------------------------------------- decode


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated Avro payload")
        chunk = self.data[self.pos : self.pos + n]
        self.pos += n
        return chunk

    def varint(self) -> int:
        shift = 0
        acc = 0
        while True:
            (b,) = self.read(1)
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(acc)
            shift += 7
            if shift > 63:
                raise ValueError("varint too long")


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, list):  # union
        branch = r.varint()
        if not 0 <= branch < len(schema):
            raise ValueError(f"union branch {branch} out of range")
        return _decode(r, schema[branch])
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.varint()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.varint())
    if t == "string":
        return r.read(r.varint()).decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.varint()]
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "array":
        items = []
        while True:
            count = r.varint()
            if count == 0:
                return items
            if count < 0:  # block with byte-size prefix (spec-allowed)
                count = -count
                r.varint()
            for _ in range(count):
                items.append(_decode(r, schema["items"]))
    if t == "map":
        result: dict[str, Any] = {}
        while True:
            count = r.varint()
            if count == 0:
                return result
            if count < 0:
                count = -count
                r.varint()
            for _ in range(count):
                k = _decode(r, "string")
                result[k] = _decode(r, schema["values"])
    raise ValueError(f"unsupported Avro type {t!r}")


def decode(schema: Any, data: bytes) -> Any:
    """Decode one Avro-binary value; raises on trailing garbage."""
    r = _Reader(bytes(data))
    value = _decode(r, _schema(schema))
    if r.pos != len(r.data):
        raise ValueError(f"{len(r.data) - r.pos} trailing bytes after value")
    return value


# ------------------------------------------- canonical form + fingerprint

_CANONICAL_KEYS = ("name", "type", "fields", "symbols", "items", "values", "size")


def _canonical(schema: Any, namespace: str = "") -> Any:
    """Parsing canonical form (spec "Transforming into PCF"): strip
    attributes outside the reserved set, resolve fullnames, fix key
    order. Returned as plain data; ``canonical_form`` renders JSON."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return [_canonical(b, namespace) for b in schema]
    t = schema["type"]
    if t in PRIMITIVES:
        return t
    out: dict[str, Any] = {}
    ns = schema.get("namespace", namespace)
    if t in ("record", "enum", "fixed"):
        name = schema["name"]
        out["name"] = name if "." in name else (f"{ns}.{name}" if ns else name)
    out["type"] = t
    if t == "record":
        out["fields"] = [
            {"name": f["name"], "type": _canonical(f["type"], ns)}
            for f in schema["fields"]
        ]
    elif t == "enum":
        out["symbols"] = schema["symbols"]
    elif t == "array":
        out["items"] = _canonical(schema["items"], ns)
    elif t == "map":
        out["values"] = _canonical(schema["values"], ns)
    elif t == "fixed":
        out["size"] = schema["size"]
    return out


def canonical_form(schema: Any) -> str:
    def render(node: Any) -> str:
        if isinstance(node, str):
            return json.dumps(node)
        if isinstance(node, list):
            return "[" + ",".join(render(b) for b in node) + "]"
        if isinstance(node, int):
            return str(node)
        parts = [
            f"{json.dumps(k)}:{render(node[k])}"
            for k in _CANONICAL_KEYS
            if k in node
        ]
        return "{" + ",".join(parts) + "}"

    return render(_canonical(_schema(schema)))


_EMPTY64 = 0xC15D213AA4D7A795  # CRC-64-AVRO seed (spec constant)


def rabin_fingerprint(schema: Any) -> int:
    """64-bit CRC-64-AVRO Rabin fingerprint of the canonical form."""
    table = []
    for i in range(256):
        fp = i
        for _ in range(8):
            fp = (fp >> 1) ^ (_EMPTY64 & -(fp & 1))
        table.append(fp)
    fp = _EMPTY64
    for b in canonical_form(schema).encode("utf-8"):
        fp = (fp >> 8) ^ table[(fp ^ b) & 0xFF]
    return fp


# ------------------------------------------------- Confluent wire framing

WIRE_MAGIC = 0


def frame(schema_id: int, body: bytes) -> bytes:
    """Confluent wire format: 0x00 + 4-byte BE schema id + Avro body —
    the layout ``read_kafka_events`` strips with substring(value, 6)."""
    return struct.pack(">bI", WIRE_MAGIC, schema_id) + body


def unframe(payload: bytes) -> tuple[int, bytes]:
    if len(payload) < 5 or payload[0] != WIRE_MAGIC:
        raise ValueError("not a Confluent-framed Avro payload")
    (schema_id,) = struct.unpack(">I", payload[1:5])
    return schema_id, payload[5:]


class LocalSchemaRegistry:
    """In-process analog of the reference's Schema Registry client
    (``producer/schema_registry.py:13-30``): register-by-canonical-form
    gives stable ids, lookup by id gives the parsed schema back."""

    def __init__(self, compatibility: str = "NONE") -> None:
        if compatibility not in COMPAT_MODES:
            raise ValueError(f"compatibility must be one of {COMPAT_MODES}")
        self.compatibility = compatibility
        self._by_id: dict[int, Any] = {}
        self._ids: dict[str, int] = {}

    def register(self, schema: Any) -> int:
        key = canonical_form(schema)
        if key not in self._ids:
            if self._ids and self.compatibility != "NONE":
                latest = self._by_id[len(self._ids)]
                problems = check_compatibility(
                    latest, schema, mode=self.compatibility
                )
                if problems:
                    raise ValueError(
                        f"schema rejected under {self.compatibility} "
                        f"compatibility: {problems}"
                    )
            new_id = len(self._ids) + 1
            self._ids[key] = new_id
            self._by_id[new_id] = _schema(schema)
        return self._ids[key]

    def schema_for(self, schema_id: int) -> Any:
        return self._by_id[schema_id]

    def serialize(self, schema_id: int, value: Any) -> bytes:
        return frame(schema_id, encode(self._by_id[schema_id], value))

    def deserialize(self, payload: bytes) -> Any:
        schema_id, body = unframe(payload)
        return decode(self._by_id[schema_id], body)


# ---------------------------------------------------- schema resolution

_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _type_of(schema: Any) -> str:
    return schema if isinstance(schema, str) else schema["type"]


def _default_value(reader: Any, default: Any) -> Any:
    """JSON default -> runtime value (spec: bytes/fixed defaults are
    unicode strings holding latin-1 bytes)."""
    t = _type_of(reader[0] if isinstance(reader, list) else reader)
    if t in ("bytes", "fixed") and isinstance(default, str):
        return default.encode("latin-1")
    if t == "record":
        sub = reader[0] if isinstance(reader, list) else reader
        return {
            f["name"]: _default_value(f["type"], f.get("default"))
            for f in sub["fields"]
        }
    return default


def _promote(value: Any, writer_t: str, reader_t: str) -> Any:
    if writer_t == reader_t:
        return value
    if reader_t in ("float", "double"):
        return float(value)
    if writer_t == "string" and reader_t == "bytes":
        return value.encode("utf-8")
    if writer_t == "bytes" and reader_t == "string":
        return value.decode("utf-8")
    return value  # int -> long


def _resolve_decode(r: _Reader, writer: Any, reader: Any) -> Any:
    # Writer union: the branch index comes off the wire first.
    if isinstance(writer, list):
        branch = r.varint()
        if not 0 <= branch < len(writer):
            raise ValueError(f"union branch {branch} out of range")
        return _resolve_decode(r, writer[branch], reader)
    # Reader union (writer not a union): find the matching branch.
    if isinstance(reader, list):
        for branch in reader:
            mark = r.pos
            try:
                return _resolve_decode_nonunion(r, writer, branch)
            except _NoMatch:
                r.pos = mark  # nested mismatch may have consumed bytes
                continue
        raise ValueError(
            f"writer type {_type_of(writer)!r} matches no reader union branch"
        )
    return _resolve_decode_nonunion(r, writer, reader)


class _NoMatch(Exception):
    """Writer/reader branch pair is structurally incompatible (checked
    BEFORE consuming wire bytes, so union scanning is safe)."""


def _resolve_decode_nonunion(r: _Reader, writer: Any, reader: Any) -> Any:
    wt, rt = _type_of(writer), _type_of(reader)
    if wt in _PROMOTIONS:
        if rt not in _PROMOTIONS.get(wt, ()):
            raise _NoMatch(f"{wt} !~ {rt}")
        return _promote(_decode(r, wt), wt, rt)
    if wt != rt:
        raise _NoMatch(f"{wt} !~ {rt}")
    if wt in ("null", "boolean"):
        return _decode(r, wt)
    if wt == "fixed":
        if writer["size"] != reader["size"]:
            raise _NoMatch("fixed size mismatch")
        return r.read(writer["size"])
    if wt == "enum":
        symbol = writer["symbols"][r.varint()]
        if symbol in reader["symbols"]:
            return symbol
        if "default" in reader:
            return reader["default"]
        raise ValueError(f"enum symbol {symbol!r} absent from reader schema")
    if wt == "array":
        items = []
        while True:
            count = r.varint()
            if count == 0:
                return items
            if count < 0:
                count = -count
                r.varint()
            for _ in range(count):
                items.append(_resolve_decode(r, writer["items"], reader["items"]))
    if wt == "map":
        result: dict[str, Any] = {}
        while True:
            count = r.varint()
            if count == 0:
                return result
            if count < 0:
                count = -count
                r.varint()
            for _ in range(count):
                k = _decode(r, "string")
                result[k] = _resolve_decode(r, writer["values"], reader["values"])
    if wt == "record":
        reader_fields = {f["name"]: f for f in reader["fields"]}
        out: dict[str, Any] = {}
        for wf in writer["fields"]:
            rf = reader_fields.get(wf["name"])
            if rf is None:
                _decode(r, wf["type"])  # skip writer-only field
            else:
                out[wf["name"]] = _resolve_decode(r, wf["type"], rf["type"])
        written = {f["name"] for f in writer["fields"]}
        for rf in reader["fields"]:
            if rf["name"] not in written:
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} absent from writer "
                        "data and has no default"
                    )
                out[rf["name"]] = _default_value(rf["type"], rf["default"])
        return {f["name"]: out[f["name"]] for f in reader["fields"]}
    raise ValueError(f"unsupported Avro type {wt!r}")


def decode_resolved(writer_schema: Any, reader_schema: Any, data: bytes) -> Any:
    """Decode data written under ``writer_schema`` as ``reader_schema``
    (spec "Schema Resolution"): skipped writer-only fields, defaulted
    reader-only fields, numeric/string-bytes promotions, union
    re-resolution, enum reader-default. This is what lets a warehouse
    consumer evolve independently of the producer fleet — the registry
    compatibility story of ``producer/schema_registry.py``."""
    r = _Reader(bytes(data))
    value = _resolve_decode(r, _schema(writer_schema), _schema(reader_schema))
    if r.pos != len(r.data):
        raise ValueError(f"{len(r.data) - r.pos} trailing bytes after value")
    return value


# ------------------------------------------- Object Container Files (OCF)

OCF_MAGIC = b"Obj\x01"

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(
    schema: Any,
    records: list,
    sync: bytes = b"\x00" * 16,
    codec: str = "null",
    block_records: int = 1000,
) -> bytes:
    """Serialize records to an Avro Object Container File (spec "Object
    Container Files"): magic, metadata map (avro.schema/avro.codec),
    sync marker, then blocks of (count, byte-size, data, sync).
    Codecs: 'null' and 'deflate' (raw zlib, stdlib)."""
    import zlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r}")
    parsed = _schema(schema)
    out = bytearray(OCF_MAGIC)
    meta = {
        "avro.schema": json.dumps(parsed).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _encode(out, _META_SCHEMA, meta)
    out += sync
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        body = bytearray()
        for rec in chunk:
            _encode(body, parsed, rec)
        data = bytes(body)
        if codec == "deflate":
            # spec: deflate = RFC 1951 stream without zlib header/checksum
            data = zlib.compress(data, 9)[2:-4]
        _write_varint(out, len(chunk))
        _write_varint(out, len(data))
        out += data
        out += sync
    return bytes(out)


def read_ocf(payload: bytes, reader_schema: Any = None) -> tuple[Any, list]:
    """Parse an OCF: returns (writer schema, records). With a
    ``reader_schema``, each record goes through spec schema resolution
    — how a directory of files from several producer versions reads
    into one shape."""
    import zlib

    r = _Reader(bytes(payload))
    if r.read(4) != OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _decode(r, _META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r}")
    reader = _schema(reader_schema) if reader_schema is not None else None
    sync = r.read(16)
    records = []
    while r.pos < len(r.data):
        count = r.varint()
        size = r.varint()
        data = r.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        block = _Reader(data)
        for _ in range(count):
            if reader is None:
                records.append(_decode(block, schema))
            else:
                records.append(_resolve_decode(block, schema, reader))
        if block.pos != len(block.data):
            raise ValueError("OCF block has trailing bytes")
        if r.read(16) != sync:
            raise ValueError("OCF sync marker mismatch (corrupt block)")
    return schema, records


# -------------------------------------------- compatibility checking


def _branches(schema: Any) -> list:
    return schema if isinstance(schema, list) else [schema]


def can_read(writer: Any, reader: Any, path: str = "$") -> list[str]:
    """Static check that data written under ``writer`` is readable
    under ``reader`` (the resolution rules of :func:`decode_resolved`,
    applied to the schemas instead of a payload). Returns the list of
    incompatibilities — empty means compatible. This is the check a
    schema registry runs at register time (Confluent BACKWARD mode =
    ``can_read(old, new)``)."""
    writer, reader = _schema(writer), _schema(reader)
    problems: list[str] = []
    # every writer branch must be readable by some reader branch
    for wb in _branches(writer):
        wt = _type_of(wb)
        targets = _branches(reader)
        ok = False
        for rb in targets:
            rt = _type_of(rb)
            if wt in _PROMOTIONS and rt in _PROMOTIONS[wt]:
                ok = True
                break
            if wt != rt:
                continue
            if wt in ("null", "boolean"):
                ok = True
            elif wt == "fixed":
                ok = wb["size"] == rb["size"]
            elif wt == "enum":
                missing = set(wb["symbols"]) - set(rb["symbols"])
                ok = not missing or "default" in rb
            elif wt == "array":
                ok = not can_read(wb["items"], rb["items"], f"{path}[]")
            elif wt == "map":
                ok = not can_read(wb["values"], rb["values"], f"{path}{{}}")
            elif wt == "record":
                sub = _record_can_read(wb, rb, path)
                if sub and len(_branches(reader)) == 1:
                    problems.extend(sub)
                ok = not sub
            if ok:
                break
        if not ok and not problems:
            problems.append(
                f"{path}: writer type {wt!r} unreadable as "
                f"{[_type_of(b) for b in _branches(reader)]}"
            )
    return problems


def _record_can_read(writer: dict, reader: dict, path: str) -> list[str]:
    problems: list[str] = []
    wfields = {f["name"]: f for f in writer["fields"]}
    for rf in reader["fields"]:
        wf = wfields.get(rf["name"])
        if wf is None:
            if "default" not in rf:
                problems.append(
                    f"{path}.{rf['name']}: reader field has no writer "
                    "counterpart and no default"
                )
        else:
            problems.extend(
                can_read(wf["type"], rf["type"], f"{path}.{rf['name']}")
            )
    return problems


COMPAT_MODES = ("NONE", "BACKWARD", "FORWARD", "FULL")


def check_compatibility(old: Any, new: Any, mode: str = "BACKWARD") -> list[str]:
    """Registry-style compatibility verdict between schema versions:
    BACKWARD = consumers on ``new`` still read ``old`` data; FORWARD =
    consumers on ``old`` read ``new`` data; FULL = both."""
    if mode not in COMPAT_MODES:
        raise ValueError(f"mode must be one of {COMPAT_MODES}")
    problems = []
    if mode in ("BACKWARD", "FULL"):
        problems += [f"BACKWARD: {p}" for p in can_read(old, new)]
    if mode in ("FORWARD", "FULL"):
        problems += [f"FORWARD: {p}" for p in can_read(new, old)]
    return problems
