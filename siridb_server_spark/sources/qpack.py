"""qpack: the reference's compact binary serialization, pure Python.

Wire format studied from the reference implementation
(/root/reference/include/qpack/qpack.h:20-67,
/root/reference/src/qpack/qpack.c:45-71 QP_PREPARE_RAW,
:482-530 qp_add_int64, :448-467 qp_add_double, :840-1000 unpack):

====================  =========================================
byte                  meaning
====================  =========================================
0x00-0x3F (0-63)      positive tiny int, value = byte
0x40-0x7B (64-123)    negative tiny int, value = 63 - byte
                      (covers -1 .. -60)
0x7C (124)            hook (unused by the engine)
0x7D-0x7F (125-127)   fixed doubles: value = byte - 126
                      (-1.0, 0.0, 1.0)
0x80-0xE3 (128-227)   raw, length = byte - 128 (0..99), bytes
                      follow
0xE4-0xE7 (228-231)   RAW8/16/32/64: unsigned little-endian
                      length follows, then bytes
0xE8-0xEB (232-235)   INT8/16/32/64: signed little-endian value
0xEC (236)            DOUBLE: 8-byte IEEE-754 little-endian
0xED-0xF2 (237-242)   fixed array of 0..5 items
0xF3-0xF8 (243-248)   fixed map of 0..5 (key, value) pairs
0xF9 / 0xFA / 0xFB    true / false / null
0xFC / 0xFD           array open / map open (unbounded)
0xFE / 0xFF           array close / map close
====================  =========================================

Encoding choices mirror the reference packer: ints take the smallest
lane (tiny covers 0..63 and -60..-1); 0.0/±1.0 collapse to the fixed
double bytes; raws < 100 bytes use the one-byte form; containers with
≤ 5 items use the fixed headers, larger ones the open/close frame.
An open container that never sees its close byte ends at the end of
the buffer (the reference unpacker treats QP_END the same way).

``unpackb`` decodes raws to ``str`` when they are valid UTF-8 and to
``bytes`` otherwise — the same convenience the reference's Python
client applies before handing results to user code.
"""

from __future__ import annotations

import struct
from typing import Any

QP_HOOK = 124
QP_DOUBLE_N1 = 125  # 125..127 → value = byte - 126
QP_RAW8, QP_RAW16, QP_RAW32, QP_RAW64 = 228, 229, 230, 231
QP_INT8, QP_INT16, QP_INT32, QP_INT64 = 232, 233, 234, 235
QP_DOUBLE = 236
QP_ARRAY0 = 237  # ..242
QP_MAP0 = 243  # ..248
QP_TRUE, QP_FALSE, QP_NULL = 249, 250, 251
QP_ARRAY_OPEN, QP_MAP_OPEN = 252, 253
QP_ARRAY_CLOSE, QP_MAP_CLOSE = 254, 255

_INT64_MIN, _INT64_MAX = -(1 << 63), (1 << 63) - 1


class QpackError(ValueError):
    pass


# ------------------------------------------------------------------ pack
def _pack_int(out: bytearray, v: int):
    if not _INT64_MIN <= v <= _INT64_MAX:
        raise QpackError(f"integer out of int64 range: {v}")
    if 0 <= v < 64:
        out.append(v)
    elif -60 <= v < 0:
        out.append(63 - v)
    elif -(1 << 7) <= v < (1 << 7):
        out.append(QP_INT8)
        out += struct.pack("<b", v)
    elif -(1 << 15) <= v < (1 << 15):
        out.append(QP_INT16)
        out += struct.pack("<h", v)
    elif -(1 << 31) <= v < (1 << 31):
        out.append(QP_INT32)
        out += struct.pack("<i", v)
    else:
        out.append(QP_INT64)
        out += struct.pack("<q", v)


def _pack_raw(out: bytearray, b: bytes):
    n = len(b)
    if n < 100:
        out.append(128 + n)
    elif n <= 0xFF:
        out.append(QP_RAW8)
        out.append(n)
    elif n <= 0xFFFF:
        out.append(QP_RAW16)
        out += struct.pack("<H", n)
    elif n <= 0xFFFFFFFF:
        out.append(QP_RAW32)
        out += struct.pack("<I", n)
    else:
        out.append(QP_RAW64)
        out += struct.pack("<Q", n)
    out += b


def _pack(out: bytearray, v: Any):
    if v is None:
        out.append(QP_NULL)
    elif v is True:
        out.append(QP_TRUE)
    elif v is False:
        out.append(QP_FALSE)
    elif isinstance(v, int):
        _pack_int(out, v)
    elif isinstance(v, float):
        if v == 0.0:
            out.append(126)
        elif v == 1.0:
            out.append(127)
        elif v == -1.0:
            out.append(125)
        else:
            out.append(QP_DOUBLE)
            out += struct.pack("<d", v)
    elif isinstance(v, str):
        _pack_raw(out, v.encode("utf-8"))
    elif isinstance(v, (bytes, bytearray, memoryview)):
        _pack_raw(out, bytes(v))
    elif isinstance(v, (list, tuple)):
        if len(v) <= 5:
            out.append(QP_ARRAY0 + len(v))
            for item in v:
                _pack(out, item)
        else:
            out.append(QP_ARRAY_OPEN)
            for item in v:
                _pack(out, item)
            out.append(QP_ARRAY_CLOSE)
    elif isinstance(v, dict):
        if len(v) <= 5:
            out.append(QP_MAP0 + len(v))
            for k, item in v.items():
                _pack(out, k)
                _pack(out, item)
        else:
            out.append(QP_MAP_OPEN)
            for k, item in v.items():
                _pack(out, k)
                _pack(out, item)
            out.append(QP_MAP_CLOSE)
    else:
        raise QpackError(f"cannot qpack type {type(v).__name__}")


def packb(v: Any) -> bytes:
    out = bytearray()
    _pack(out, v)
    return bytes(out)


# ---------------------------------------------------------------- unpack
class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def peek(self) -> int:
        return self.buf[self.pos]

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise QpackError("truncated qpack data")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b


def _raw(r: _Reader, n: int):
    b = r.take(n)
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return bytes(b)


def _unpack(r: _Reader):
    tp = r.take(1)[0]
    if tp < 64:
        return tp
    if tp < 124:
        return 63 - tp
    if tp == QP_HOOK:
        raise QpackError("hook objects are not supported")
    if tp < 128:  # 125..127
        return float(tp - 126)
    if tp < 228:  # fixed raw
        return _raw(r, tp - 128)
    if tp == QP_RAW8:
        return _raw(r, r.take(1)[0])
    if tp == QP_RAW16:
        return _raw(r, struct.unpack("<H", r.take(2))[0])
    if tp == QP_RAW32:
        return _raw(r, struct.unpack("<I", r.take(4))[0])
    if tp == QP_RAW64:
        return _raw(r, struct.unpack("<Q", r.take(8))[0])
    if tp == QP_INT8:
        return struct.unpack("<b", r.take(1))[0]
    if tp == QP_INT16:
        return struct.unpack("<h", r.take(2))[0]
    if tp == QP_INT32:
        return struct.unpack("<i", r.take(4))[0]
    if tp == QP_INT64:
        return struct.unpack("<q", r.take(8))[0]
    if tp == QP_DOUBLE:
        return struct.unpack("<d", r.take(8))[0]
    if tp <= 242:  # fixed array
        return [_unpack(r) for _ in range(tp - QP_ARRAY0)]
    if tp <= 248:  # fixed map
        return {_unpack(r): _unpack(r) for _ in range(tp - QP_MAP0)}
    if tp == QP_TRUE:
        return True
    if tp == QP_FALSE:
        return False
    if tp == QP_NULL:
        return None
    if tp == QP_ARRAY_OPEN:
        items = []
        while not r.eof() and r.peek() != QP_ARRAY_CLOSE:
            items.append(_unpack(r))
        if not r.eof():
            r.take(1)
        return items
    if tp == QP_MAP_OPEN:
        m = {}
        while not r.eof() and r.peek() != QP_MAP_CLOSE:
            k = _unpack(r)
            if r.eof() or r.peek() == QP_MAP_CLOSE:
                raise QpackError("map key without value")
            m[k] = _unpack(r)
        if not r.eof():
            r.take(1)
        return m
    raise QpackError(f"unexpected close tag 0x{tp:02x}")


def unpackb(buf: bytes) -> Any:
    if not buf:
        raise QpackError("empty qpack buffer")
    r = _Reader(bytes(buf))
    v = _unpack(r)
    if not r.eof():
        raise QpackError(
            f"trailing bytes after qpack value at {r.pos}")
    return v
