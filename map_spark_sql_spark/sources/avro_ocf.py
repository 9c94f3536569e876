"""Minimal pure-Python Avro Object Container File writer (null codec).

Exists so tests can materialize REAL ``.avro`` fixtures without fastavro or
network access, cross-validated against the JVM Avro reader (avro-mapred is
on the Spark classpath; the ``spark-avro`` DataSource module is not in this
image). The reference's single input is an Avro directory glob
(``MapBuilder.java:134-139``); production deployments read it with
``spark.read.format("avro")`` — this writer is strictly a fixture tool.

Implements the OCF spec subset we need: header (magic, metadata map with
``avro.schema``/``avro.codec``, 16-byte sync marker) and data blocks
(record count, byte size, records, sync). Supported field types: ``long``,
``int``, ``double``, ``string``, ``boolean``, and the nullable union
``["null", T]``.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC = b"Obj\x01"
# fixed sync marker: deterministic fixtures, diffable across runs
SYNC = bytes(range(16))

_SIMPLE = {"long", "int", "double", "string", "boolean"}


def _zigzag(n: int) -> bytes:
    """Avro long encoding: zigzag + base-128 varint."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(buf: io.BytesIO, typ, value) -> None:
    if isinstance(typ, list):  # nullable union ["null", T]
        if value is None:
            buf.write(_zigzag(typ.index("null")))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        buf.write(_zigzag(branch))
        _encode_value(buf, typ[branch], value)
    elif typ in ("long", "int"):
        buf.write(_zigzag(int(value)))
    elif typ == "double":
        buf.write(struct.pack("<d", float(value)))
    elif typ == "string":
        raw = str(value).encode("utf-8")
        buf.write(_zigzag(len(raw)) + raw)
    elif typ == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    else:  # pragma: no cover - guarded by write_ocf validation
        raise ValueError(f"unsupported avro type {typ!r}")


def write_ocf(path: str, name: str, fields: list[tuple[str, object]], rows: list[dict]) -> None:
    """Write ``rows`` as one Avro OCF block. ``fields`` is an ordered
    ``[(field_name, avro_type)]`` list where ``avro_type`` is a simple type
    string or a ``["null", T]`` union."""
    for _, t in fields:
        if isinstance(t, list):
            ok = len(t) == 2 and "null" in t and any(x in _SIMPLE for x in t)
        else:
            ok = t in _SIMPLE
        if not ok:
            raise ValueError(f"unsupported avro type {t!r}")
    schema = {
        "type": "record",
        "name": name,
        "fields": [{"name": f, "type": t} for f, t in fields],
    }

    meta = io.BytesIO()
    meta.write(_zigzag(2))  # map block: 2 entries
    for key, val in (
        ("avro.schema", json.dumps(schema).encode()),
        ("avro.codec", b"null"),
    ):
        raw = key.encode()
        meta.write(_zigzag(len(raw)) + raw)
        meta.write(_zigzag(len(val)) + val)
    meta.write(_zigzag(0))  # end of map

    data = io.BytesIO()
    for row in rows:
        for fname, ftype in fields:
            _encode_value(data, ftype, row.get(fname))
    payload = data.getvalue()

    with open(path, "wb") as fh:
        fh.write(MAGIC)
        fh.write(meta.getvalue())
        fh.write(SYNC)
        if rows:
            fh.write(_zigzag(len(rows)))
            fh.write(_zigzag(len(payload)))
            fh.write(payload)
            fh.write(SYNC)
