"""Pure-Python Avro binary codec — the no-jar fallback for OP-S1/OP-S2.

The reference serializes Avro IN PYTHON on both ends of the Kafka hop
(confluent-kafka AvroSerializer / AvroDeserializer behind the producer
and consumer, src/data_ingestion/producer.py:147-214 and
consumer.py:172-242, wired through schema_registry.py:337-357). The
Spark-native path (`from_avro`/`to_avro`) needs the spark-avro package
on the JVM classpath; where it is absent this module supplies the same
wire bytes from the executor's Python workers, implemented directly
from the public Apache Avro 1.11 binary-encoding specification:

- int/long: zig-zag mapped then little-endian base-128 varint;
- float/double: 4/8 bytes little-endian IEEE-754;
- string/bytes: long byte-length prefix + raw bytes (strings UTF-8);
- boolean: one byte; null: zero bytes;
- union: long index of the branch, then the branch's encoding;
- array/map: one count-prefixed block of items (+ empty terminator
  block), map entries as key-string + value;
- logical types (timestamp-micros) ride their underlying primitive.

Scope is the subset reading_avro_schema() uses (flat record of
nullable primitives + map<string, nullable string> + array<string>) —
enough to frame every sensor reading, deliberately not a full Avro
implementation (no named-type references, recursion, enums, fixed).
Reader-SCHEMA RESOLUTION (the Confluent deserializer's evolution
contract: decode bytes written under an OLD schema into a NEW reader
shape — skipped fields, defaults/nullable fills, sanctioned
promotions) is supported via decode_record(reader_schema=...), r12.

Optionally frames messages in the Confluent Schema-Registry wire
format the reference actually ships (magic byte 0x00 + 4-byte
big-endian schema id + Avro body — the 5-byte header
schema_registry-serialized messages carry).
"""

from __future__ import annotations

import json
import struct

_MAGIC = b"\x00"


# --- primitive writers (spec: binary encoding, zig-zag + varint) -----------


def _write_long(out: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # zig-zag: 0,-1,1,-2,... -> 0,1,2,3,...
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    z = 0
    while True:
        if pos >= len(buf):
            raise ValueError(f"truncated Avro buffer: varint runs past offset {pos}")
        if shift > 63:
            # a spec zig-zag long fits in 10 bytes; more means the
            # stream is corrupt, not a bigger number
            raise ValueError(f"corrupt Avro varint at offset {pos}: > 10 bytes")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos  # un-zig-zag


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out.extend(b)


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    if n < 0:
        raise ValueError(f"corrupt Avro bytes length {n} at offset {pos}")
    if pos + n > len(buf):
        # an unguarded slice would silently return FEWER bytes than the
        # length prefix claims — truncated data masquerading as valid
        raise ValueError(
            f"truncated Avro buffer: {n}-byte value at offset {pos} "
            f"overruns the {len(buf)}-byte payload"
        )
    return buf[pos : pos + n], pos + n


# --- schema-driven encode / decode -----------------------------------------


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _encode(schema, value, out: bytearray) -> None:
    t = _type_name(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise ValueError(f"value {value!r} matches no union branch of {schema!r}")
    if t == "null":
        if value is not None:
            raise ValueError(f"non-null {value!r} for null schema")
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.extend(struct.pack("<f", float(value)))
    elif t == "double":
        out.extend(struct.pack("<d", float(value)))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out)
    elif t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(schema["items"], it, out)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _matches(branch, value) -> bool:
    t = _type_name(branch)
    if t == "null":
        return value is None
    return value is not None


# --- reader-schema resolution (Avro spec "Schema Resolution") ---------------

# sanctioned datum promotions, writer type -> reader type
_PROMOTIONS = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def _resolve_value(writer, reader, value, path: str = "$"):
    """Project a value decoded under `writer` into the `reader` shape
    per the Avro spec's Schema Resolution rules: fields match by name,
    reader-only fields take their default (or null when their union
    allows it), writer-only fields are dropped, and only the spec's
    promotions cross primitive types. Anything else fails loud —
    a silent best-effort read is how evolution bugs ship."""
    wt, rt = _type_name(writer), _type_name(reader)
    if wt == "union":
        for branch in writer:
            if _matches(branch, value):
                return _resolve_value(branch, reader, value, path)
        raise ValueError(f"{path}: value matches no writer union branch")
    if rt == "union":
        for branch in reader:
            try:
                return _resolve_value(writer, branch, value, path)
            except ValueError:
                continue
        raise ValueError(
            f"{path}: writer {wt} value {value!r} fits no reader union branch"
        )
    if rt == "record":
        if wt != "record":
            raise ValueError(f"{path}: writer {wt} is not a record")
        wfields = {f["name"]: f for f in writer["fields"]}
        out = {}
        for f in reader["fields"]:
            name = f["name"]
            if name in wfields:
                out[name] = _resolve_value(
                    wfields[name]["type"], f["type"], value[name], f"{path}.{name}"
                )
            elif "default" in f:
                out[name] = f["default"]
            elif isinstance(f["type"], list) and "null" in f["type"]:
                out[name] = None
            else:
                raise ValueError(
                    f"{path}.{name}: reader field absent from writer schema "
                    "and has no default"
                )
        return out
    if rt == "array":
        if wt != "array":
            raise ValueError(f"{path}: writer {wt} is not an array")
        return [
            _resolve_value(writer["items"], reader["items"], v, path + "[]")
            for v in value
        ]
    if rt == "map":
        if wt != "map":
            raise ValueError(f"{path}: writer {wt} is not a map")
        return {
            k: _resolve_value(writer["values"], reader["values"], v, path + "<value>")
            for k, v in value.items()
        }
    if wt == rt:
        return value
    if (wt, rt) in _PROMOTIONS:
        if rt in ("float", "double"):
            return float(value)
        if rt == "long":
            return int(value)
        if rt == "bytes":
            return value.encode("utf-8") if isinstance(value, str) else value
        return (
            value.decode("utf-8")
            if isinstance(value, (bytes, bytearray))
            else value
        )
    raise ValueError(
        f"{path}: writer type {wt} is not readable as reader type {rt} "
        "(not a sanctioned Avro promotion)"
    )


def _decode(schema, buf: bytes, pos: int):
    t = _type_name(schema)
    if t == "union":
        i, pos = _read_long(buf, pos)
        if not 0 <= i < len(schema):
            # without this check a corrupt NEGATIVE index (e.g. byte
            # 0x01 = zig-zag -1) would silently decode the LAST branch
            # via Python negative indexing — wrong data, no error
            raise ValueError(
                f"corrupt Avro union index {i} (schema has {len(schema)} branches)"
            )
        return _decode(schema[i], buf, pos)
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError(f"truncated Avro buffer at offset {pos}")
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if t == "bytes":
        return _read_bytes(buf, pos)
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], buf, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-legal writer form)
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                it, pos = _decode(schema["items"], buf, pos)
                items.append(it)
        return items, pos
    if t == "map":
        entries = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                kb, pos = _read_bytes(buf, pos)
                entries[kb.decode("utf-8")], pos = _decode(schema["values"], buf, pos)
        return entries, pos
    raise ValueError(f"unsupported Avro type {t!r}")


# --- public surface ---------------------------------------------------------


def parse_schema(schema_json: str):
    return json.loads(schema_json)


def encode_record(schema, record: dict, schema_id: int | None = None) -> bytes:
    """record dict -> Avro binary body; with schema_id, prepend the
    Confluent wire header (magic 0x00 + 4-byte big-endian id) the
    reference's schema-registry serializer writes."""
    out = bytearray()
    if schema_id is not None:
        out.extend(_MAGIC)
        out.extend(struct.pack(">I", schema_id))
    _encode(schema, record, out)
    return bytes(out)


def decode_record(
    schema, payload: bytes, confluent_framed: bool = False, reader_schema=None
) -> dict:
    """Avro binary body -> record dict; confluent_framed strips the
    5-byte registry header first (consumer.py's deserialize step).
    `schema` is the WRITER schema (what the bytes were encoded under —
    the registry's role is delivering exactly this); pass
    reader_schema to additionally resolve the record into an evolved
    reader shape per the spec's Schema Resolution rules — the
    Confluent AvroDeserializer contract a BACKWARD-compatible registry
    subject relies on."""
    pos = 0
    if confluent_framed:
        if payload[:1] != _MAGIC:
            raise ValueError("missing Confluent magic byte 0x00")
        pos = 5
    try:
        rec, end = _decode(schema, payload, pos)
    except (IndexError, struct.error) as e:
        # float/double unpack past the buffer, or any residual index
        # miss: surface as the same fail-loud contract as the explicit
        # guards, never a raw low-level error
        raise ValueError(f"truncated Avro record: {e}") from e
    if end != len(payload):
        raise ValueError(f"trailing bytes after record: {len(payload) - end}")
    if reader_schema is not None:
        return _resolve_value(schema, reader_schema, rec)
    return rec
