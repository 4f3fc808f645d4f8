"""Hand-built ONNX model encoding for importer tests (real protobuf wire
format via birdnet_go_tpu.inference.protowire encoders)."""

from __future__ import annotations

import struct

import numpy as np

from birdnet_go_tpu.inference import protowire as pw

_DT = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
       np.dtype(np.int8): 3, np.dtype(np.uint8): 2,
       np.dtype(np.int32): 6, np.dtype(np.float16): 10}


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    out = b""
    for d in arr.shape:
        out += pw.encode_varint_field(1, d)
    out += pw.encode_varint_field(2, _DT[arr.dtype])
    out += pw.encode_len_field(8, name.encode())
    out += pw.encode_len_field(9, np.ascontiguousarray(arr).tobytes())
    return out


def attr_int(name: str, v: int) -> bytes:
    return (pw.encode_len_field(1, name.encode())
            + pw.encode_varint_field(3, v if v >= 0 else v + (1 << 64))
            + pw.encode_varint_field(20, 2))


def attr_float(name: str, v: float) -> bytes:
    return (pw.encode_len_field(1, name.encode())
            + pw.encode_tag(2, 5) + struct.pack("<f", v)
            + pw.encode_varint_field(20, 1))


def attr_ints(name: str, vals) -> bytes:
    out = pw.encode_len_field(1, name.encode())
    for v in vals:
        out += pw.encode_varint_field(8, v if v >= 0 else v + (1 << 64))
    out += pw.encode_varint_field(20, 7)
    return out


def node(op_type: str, inputs, outputs, attrs: list[bytes] = ()) -> bytes:
    out = b""
    for i in inputs:
        out += pw.encode_len_field(1, i.encode())
    for o in outputs:
        out += pw.encode_len_field(2, o.encode())
    out += pw.encode_len_field(4, op_type.encode())
    for a in attrs:
        out += pw.encode_len_field(5, a)
    return out


def value_info(name: str) -> bytes:
    return pw.encode_len_field(1, name.encode())


def model(nodes: list[bytes], initializers: list[bytes],
          inputs: list[str], outputs: list[str]) -> bytes:
    g = b""
    for n in nodes:
        g += pw.encode_len_field(1, n)
    g += pw.encode_len_field(2, b"testgraph")
    for t in initializers:
        g += pw.encode_len_field(5, t)
    for i in inputs:
        g += pw.encode_len_field(11, value_info(i))
    for o in outputs:
        g += pw.encode_len_field(12, value_info(o))
    m = pw.encode_varint_field(1, 8)               # ir_version
    m += pw.encode_len_field(7, g)
    return m
