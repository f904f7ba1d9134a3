"""Minimal pure-Python MessagePack codec for the knowledge-core exchange
format (reference: trustgraph-cli/trustgraph/cli/get_kg_core.py:17-73 /
put_kg_core.py:16-60 and gateway/dispatch/core_export.py:36-105 write and
read knowledge cores as a stream of msgpack-encoded records).

The reference depends on the ``msgpack`` package; this image has no such
dependency, so the subset of the public MessagePack specification
(https://github.com/msgpack/msgpack/blob/master/spec.md) the core format
uses is implemented here from the spec: nil, bool, all int widths,
float32/64, str, bin, array, map.  Encoding choices mirror
``msgpack.packb(obj, use_bin_type=True)`` so the bytes we emit are the
bytes the reference's tooling emits for the same objects:

- ints pack to the smallest representation (positive -> fixint/uint
  family, negative -> fixint/int family),
- floats always pack as float64,
- str uses the str family (fixstr/str8/str16/str32), bytes the bin
  family — the ``use_bin_type=True`` convention every reference call
  site passes,
- tuples and lists both pack as arrays; dict order is insertion order.

Decoding mirrors ``msgpack.Unpacker(f, raw=False)``: str payloads are
UTF-8-decoded, bin payloads stay ``bytes``.  Ext types never occur in
the core format and raise.  This is a deliberate Python seam: a binary
serialization codec (same sanctioned class as the media decoders); the
Spark data plane only ever sees it inside the kgcore mapInPandas /
applyInPandas boundaries operating on batched byte blobs.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator


class MpackError(ValueError):
    """Raised on unencodable objects or malformed input bytes."""


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _pack_into(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        _pack_str(obj, out)
    elif isinstance(obj, (bytes, bytearray)):
        _pack_bin(bytes(obj), out)
    elif isinstance(obj, (list, tuple)):
        _pack_header(len(obj), 0x90, 0xDC, 0xDD, out, fix_max=15)
        for item in obj:
            _pack_into(item, out)
    elif isinstance(obj, dict):
        _pack_header(len(obj), 0x80, 0xDE, 0xDF, out, fix_max=15)
        for k, v in obj.items():
            _pack_into(k, out)
            _pack_into(v, out)
    else:
        raise MpackError(f"cannot msgpack-encode {type(obj).__name__}")


def _pack_int(x: int, out: bytearray) -> None:
    if 0 <= x <= 0x7F:
        out.append(x)
    elif -32 <= x < 0:
        out.append(x & 0xFF)
    elif x > 0:
        if x <= 0xFF:
            out.append(0xCC)
            out.append(x)
        elif x <= 0xFFFF:
            out.append(0xCD)
            out += struct.pack(">H", x)
        elif x <= 0xFFFFFFFF:
            out.append(0xCE)
            out += struct.pack(">I", x)
        elif x <= 0xFFFFFFFFFFFFFFFF:
            out.append(0xCF)
            out += struct.pack(">Q", x)
        else:
            raise MpackError("int too large for msgpack")
    else:
        if x >= -0x80:
            out.append(0xD0)
            out += struct.pack(">b", x)
        elif x >= -0x8000:
            out.append(0xD1)
            out += struct.pack(">h", x)
        elif x >= -0x80000000:
            out.append(0xD2)
            out += struct.pack(">i", x)
        elif x >= -0x8000000000000000:
            out.append(0xD3)
            out += struct.pack(">q", x)
        else:
            raise MpackError("int too small for msgpack")


def _pack_str(s: str, out: bytearray) -> None:
    b = s.encode("utf-8")
    n = len(b)
    if n <= 31:
        out.append(0xA0 | n)
    elif n <= 0xFF:
        out.append(0xD9)
        out.append(n)
    elif n <= 0xFFFF:
        out.append(0xDA)
        out += struct.pack(">H", n)
    else:
        out.append(0xDB)
        out += struct.pack(">I", n)
    out += b


def _pack_bin(b: bytes, out: bytearray) -> None:
    n = len(b)
    if n <= 0xFF:
        out.append(0xC4)
        out.append(n)
    elif n <= 0xFFFF:
        out.append(0xC5)
        out += struct.pack(">H", n)
    else:
        out.append(0xC6)
        out += struct.pack(">I", n)
    out += b


def _pack_header(
    n: int, fix: int, h16: int, h32: int, out: bytearray, fix_max: int
) -> None:
    if n <= fix_max:
        out.append(fix | n)
    elif n <= 0xFFFF:
        out.append(h16)
        out += struct.pack(">H", n)
    elif n <= 0xFFFFFFFF:
        out.append(h32)
        out += struct.pack(">I", n)
    else:
        raise MpackError("container too large for msgpack")


def packb(obj: Any) -> bytes:
    """Encode one object; byte-compatible with
    ``msgpack.packb(obj, use_bin_type=True)`` for the supported types."""
    out = bytearray()
    _pack_into(obj, out)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        end = self.pos + n
        if end > len(self.data):
            raise MpackError("truncated msgpack input")
        b = self.data[self.pos:end]
        self.pos = end
        return b


def _unpack_one(r: _Reader) -> Any:
    c = r.take(1)[0]
    if c <= 0x7F:                       # positive fixint
        return c
    if c >= 0xE0:                       # negative fixint
        return c - 0x100
    if 0x80 <= c <= 0x8F:               # fixmap
        return _unpack_map(r, c & 0x0F)
    if 0x90 <= c <= 0x9F:               # fixarray
        return _unpack_array(r, c & 0x0F)
    if 0xA0 <= c <= 0xBF:               # fixstr
        return r.take(c & 0x1F).decode("utf-8")
    if c == 0xC0:
        return None
    if c == 0xC2:
        return False
    if c == 0xC3:
        return True
    if c == 0xC4:
        return bytes(r.take(r.take(1)[0]))
    if c == 0xC5:
        return bytes(r.take(struct.unpack(">H", r.take(2))[0]))
    if c == 0xC6:
        return bytes(r.take(struct.unpack(">I", r.take(4))[0]))
    if c == 0xCA:
        return struct.unpack(">f", r.take(4))[0]
    if c == 0xCB:
        return struct.unpack(">d", r.take(8))[0]
    if c == 0xCC:
        return r.take(1)[0]
    if c == 0xCD:
        return struct.unpack(">H", r.take(2))[0]
    if c == 0xCE:
        return struct.unpack(">I", r.take(4))[0]
    if c == 0xCF:
        return struct.unpack(">Q", r.take(8))[0]
    if c == 0xD0:
        return struct.unpack(">b", r.take(1))[0]
    if c == 0xD1:
        return struct.unpack(">h", r.take(2))[0]
    if c == 0xD2:
        return struct.unpack(">i", r.take(4))[0]
    if c == 0xD3:
        return struct.unpack(">q", r.take(8))[0]
    if c == 0xD9:
        return r.take(r.take(1)[0]).decode("utf-8")
    if c == 0xDA:
        return r.take(struct.unpack(">H", r.take(2))[0]).decode("utf-8")
    if c == 0xDB:
        return r.take(struct.unpack(">I", r.take(4))[0]).decode("utf-8")
    if c == 0xDC:
        return _unpack_array(r, struct.unpack(">H", r.take(2))[0])
    if c == 0xDD:
        return _unpack_array(r, struct.unpack(">I", r.take(4))[0])
    if c == 0xDE:
        return _unpack_map(r, struct.unpack(">H", r.take(2))[0])
    if c == 0xDF:
        return _unpack_map(r, struct.unpack(">I", r.take(4))[0])
    raise MpackError(f"unsupported msgpack type byte 0x{c:02x}")


def _unpack_array(r: _Reader, n: int) -> list:
    return [_unpack_one(r) for _ in range(n)]


def _unpack_map(r: _Reader, n: int) -> dict:
    out = {}
    for _ in range(n):
        k = _unpack_one(r)
        out[k] = _unpack_one(r)
    return out


def unpackb(data: bytes) -> Any:
    """Decode exactly one object; trailing bytes are an error."""
    r = _Reader(data)
    obj = _unpack_one(r)
    if r.pos != len(data):
        raise MpackError(f"{len(data) - r.pos} trailing bytes after object")
    return obj


def unpack_stream(data: bytes) -> Iterator[Any]:
    """Decode a back-to-back stream of top-level objects — the shape of a
    knowledge-core file (``msgpack.Unpacker`` over the file in the
    reference CLIs)."""
    r = _Reader(data)
    while r.pos < len(data):
        yield _unpack_one(r)
