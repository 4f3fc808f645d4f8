"""Hand-built .tflite flatbuffer construction for importer tests.

Uses the flatbuffers runtime Builder with explicit TFLite schema field ids
(no generated code) — produces genuine wire-format .tflite bytes, so the
importer is exercised against the real format, not a mock.
"""

from __future__ import annotations

import flatbuffers
import numpy as np


def _int_vector(b, vals):
    b.StartVector(4, len(vals), 4)
    for v in reversed(vals):
        b.PrependInt32(int(v))
    return b.EndVector()


def _offset_vector(b, offs):
    b.StartVector(4, len(offs), 4)
    for o in reversed(offs):
        b.PrependUOffsetTRelative(o)
    return b.EndVector()


def _buffer(b, data: bytes | None):
    data_off = None
    if data:
        data_off = b.CreateByteVector(data)
    b.StartObject(1)
    if data_off is not None:
        b.PrependUOffsetTRelativeSlot(0, data_off, 0)
    return b.EndObject()


def _float_vector(b, vals):
    b.StartVector(4, len(vals), 4)
    for v in reversed(vals):
        b.PrependFloat32(float(v))
    return b.EndVector()


def _long_vector(b, vals):
    b.StartVector(8, len(vals), 8)
    for v in reversed(vals):
        b.PrependInt64(int(v))
    return b.EndVector()


def _quant_params(b, scale, zero_point=(), qdim=0):
    """QuantizationParameters: scale=2, zero_point=3, quantized_dimension=6."""
    scale_off = _float_vector(b, scale)
    zp_off = _long_vector(b, zero_point) if zero_point else None
    b.StartObject(7)
    b.PrependUOffsetTRelativeSlot(2, scale_off, 0)
    if zp_off is not None:
        b.PrependUOffsetTRelativeSlot(3, zp_off, 0)
    if qdim:
        b.PrependInt32Slot(6, qdim, 0)
    return b.EndObject()


def _tensor(b, shape, ttype, buffer_idx, name, quant=None):
    name_off = b.CreateString(name)
    shape_off = _int_vector(b, shape)
    quant_off = _quant_params(b, *quant) if quant else None
    b.StartObject(7)
    b.PrependUOffsetTRelativeSlot(0, shape_off, 0)   # shape
    b.PrependInt8Slot(1, ttype, 0)                    # type
    b.PrependUint32Slot(2, buffer_idx, 0)             # buffer
    b.PrependUOffsetTRelativeSlot(3, name_off, 0)     # name
    if quant_off is not None:
        b.PrependUOffsetTRelativeSlot(4, quant_off, 0)  # quantization
    return b.EndObject()


def _operator_code(b, builtin):
    b.StartObject(4)
    if builtin <= 127:
        b.PrependInt8Slot(0, builtin, 0)              # deprecated_builtin_code
    b.PrependInt32Slot(2, 1, 1)                       # version
    b.PrependInt32Slot(3, builtin, 0)                 # builtin_code
    return b.EndObject()


def _operator(b, opcode_index, inputs, outputs, options_off=None):
    in_off = _int_vector(b, inputs)
    out_off = _int_vector(b, outputs)
    b.StartObject(5)
    b.PrependUint32Slot(0, opcode_index, 0)
    b.PrependUOffsetTRelativeSlot(1, in_off, 0)
    b.PrependUOffsetTRelativeSlot(2, out_off, 0)
    if options_off is not None:
        b.PrependUOffsetTRelativeSlot(4, options_off, 0)
    return b.EndObject()


def fully_connected_options(b, activation=0):
    b.StartObject(1)
    b.PrependInt8Slot(0, activation, 0)
    return b.EndObject()


def conv2d_options(b, padding=0, stride_w=1, stride_h=1, activation=0,
                   dilation_w=1, dilation_h=1):
    # TFLite Conv2DOptions: dilation_w_factor=4, dilation_h_factor=5.
    b.StartObject(7)
    b.PrependInt8Slot(0, padding, 0)
    b.PrependInt32Slot(1, stride_w, 0)
    b.PrependInt32Slot(2, stride_h, 0)
    b.PrependInt8Slot(3, activation, 0)
    b.PrependInt32Slot(4, dilation_w, 1)
    b.PrependInt32Slot(5, dilation_h, 1)
    return b.EndObject()


def dwconv2d_options(b, padding=0, stride_w=1, stride_h=1, depth_multiplier=1,
                     activation=0, dilation_w=1, dilation_h=1):
    # DepthwiseConv2DOptions: depth_multiplier=3, activation=4, dilation=5/6.
    b.StartObject(7)
    b.PrependInt8Slot(0, padding, 0)
    b.PrependInt32Slot(1, stride_w, 0)
    b.PrependInt32Slot(2, stride_h, 0)
    b.PrependInt32Slot(3, depth_multiplier, 0)
    b.PrependInt8Slot(4, activation, 0)
    b.PrependInt32Slot(5, dilation_w, 1)
    b.PrependInt32Slot(6, dilation_h, 1)
    return b.EndObject()


def pool2d_options(b, padding=1, stride_w=2, stride_h=2, fw=2, fh=2):
    b.StartObject(6)
    b.PrependInt8Slot(0, padding, 0)
    b.PrependInt32Slot(1, stride_w, 0)
    b.PrependInt32Slot(2, stride_h, 0)
    b.PrependInt32Slot(3, fw, 0)
    b.PrependInt32Slot(4, fh, 0)
    return b.EndObject()


class ModelBuilder:
    """Assembles tensors/ops/buffers then emits .tflite bytes."""

    TTYPE_F32 = 0
    TTYPE_F16 = 1
    TTYPE_I32 = 2
    TTYPE_I8 = 9

    def __init__(self):
        self.b = flatbuffers.Builder(4096)
        self.buffers_data: list[bytes | None] = [None]    # buffer 0 = empty
        self.tensors: list = []      # (shape, ttype, buffer_idx, name)
        self.ops: list = []          # (builtin, inputs, outputs, opt_fn)
        self.opcodes: list[int] = []
        self.inputs: list[int] = []
        self.outputs: list[int] = []

    def add_tensor(self, shape, name, data: np.ndarray | None = None,
                   ttype=TTYPE_F32, quant=None) -> int:
        """quant: (scale list, zero_point list, quantized_dimension) —
        attaches QuantizationParameters to the tensor."""
        if data is not None:
            self.buffers_data.append(np.ascontiguousarray(data).tobytes())
            buf_idx = len(self.buffers_data) - 1
        else:
            buf_idx = 0
        self.tensors.append((list(shape), ttype, buf_idx, name, quant))
        return len(self.tensors) - 1

    def add_op(self, builtin: int, inputs, outputs, options_fn=None):
        if builtin not in self.opcodes:
            self.opcodes.append(builtin)
        self.ops.append((self.opcodes.index(builtin), list(inputs),
                         list(outputs), options_fn))

    def finish(self) -> bytes:
        b = self.b
        buffer_offs = [_buffer(b, d) for d in self.buffers_data]
        tensor_offs = [_tensor(b, s, t, bi, n, q)
                       for s, t, bi, n, q in self.tensors]
        op_offs = []
        for opcode_idx, ins, outs, opt_fn in self.ops:
            opt_off = opt_fn(b) if opt_fn else None
            op_offs.append(_operator(b, opcode_idx, ins, outs, opt_off))
        opcode_offs = [_operator_code(b, c) for c in self.opcodes]

        tensors_v = _offset_vector(b, tensor_offs)
        inputs_v = _int_vector(b, self.inputs)
        outputs_v = _int_vector(b, self.outputs)
        ops_v = _offset_vector(b, op_offs)
        b.StartObject(5)                                   # SubGraph
        b.PrependUOffsetTRelativeSlot(0, tensors_v, 0)
        b.PrependUOffsetTRelativeSlot(1, inputs_v, 0)
        b.PrependUOffsetTRelativeSlot(2, outputs_v, 0)
        b.PrependUOffsetTRelativeSlot(3, ops_v, 0)
        sg = b.EndObject()

        sgs_v = _offset_vector(b, [sg])
        codes_v = _offset_vector(b, opcode_offs)
        buffers_v = _offset_vector(b, buffer_offs)
        desc = b.CreateString("test model")
        b.StartObject(5)                                   # Model
        b.PrependUint32Slot(0, 3, 0)                       # version
        b.PrependUOffsetTRelativeSlot(1, codes_v, 0)
        b.PrependUOffsetTRelativeSlot(2, sgs_v, 0)
        b.PrependUOffsetTRelativeSlot(3, desc, 0)
        b.PrependUOffsetTRelativeSlot(4, buffers_v, 0)
        model = b.EndObject()
        b.Finish(model, file_identifier=b"TFL3")
        return bytes(b.Output())
