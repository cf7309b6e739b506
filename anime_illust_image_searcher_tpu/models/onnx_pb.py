"""Dependency-free ONNX protobuf reader/writer (wire format, no ``onnx`` package).

The CCIP weight-conversion path (reference: gen_cfeatures.py:112-130 loads
``model_feat.onnx``/``model_metrics.onnx`` from deepghs/ccip_onnx through
onnxruntime) needs to read ONNX files, but neither ``onnx`` nor ``onnxruntime``
is available in this environment — and this framework doesn't want them as
dependencies anyway: all it needs is the *weights* and the graph structure, the
compute is re-implemented in JAX (models/caformer.py).

So this module speaks the protobuf wire format directly for the subset of
``onnx.proto`` the converter needs: ModelProto → GraphProto → NodeProto /
TensorProto / AttributeProto / ValueInfoProto. Field numbers and types follow
the onnx.proto schema (onnx/onnx.proto3 in the ONNX repo). A writer is included
so tests can construct synthetic ONNX graphs in-process and round-trip them —
the same files parse with the official ``onnx`` package on a networked machine.

Wire format recap: a message is a sequence of (key, value) where
key = (field_number << 3) | wire_type; wire types: 0 = varint, 1 = 64-bit LE,
2 = length-delimited, 5 = 32-bit LE. Repeated numeric fields may appear packed
(one length-delimited blob) or unpacked (one tagged element each); the reader
accepts both.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

# -- TensorProto.DataType values (onnx.proto3) --------------------------------
FLOAT, UINT8, INT8, UINT16, INT16, INT32, INT64 = 1, 2, 3, 4, 5, 6, 7
STRING, BOOL, FLOAT16, DOUBLE, UINT32, UINT64 = 8, 9, 10, 11, 12, 13
BFLOAT16 = 16

_DTYPE_TO_NP = {
    FLOAT: np.float32, UINT8: np.uint8, INT8: np.int8, UINT16: np.uint16,
    INT16: np.int16, INT32: np.int32, INT64: np.int64, BOOL: np.bool_,
    FLOAT16: np.float16, DOUBLE: np.float64, UINT32: np.uint32, UINT64: np.uint64,
}
_NP_TO_DTYPE = {np.dtype(v): k for k, v in _DTYPE_TO_NP.items()}

# -- AttributeProto.AttributeType ----------------------------------------------
ATTR_FLOAT, ATTR_INT, ATTR_STRING, ATTR_TENSOR = 1, 2, 3, 4
ATTR_GRAPH, ATTR_FLOATS, ATTR_INTS, ATTR_STRINGS = 5, 6, 7, 8


# ------------------------------------------------------------------ primitives


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _write_varint(value: int) -> bytes:
    if value < 0:  # two's-complement 64-bit, per protobuf int64 encoding
        value += 1 << 64
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def _fields(buf: bytes) -> Iterator[Tuple[int, int, Union[int, bytes]]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    end = len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:
            value, pos = _read_varint(buf, pos)
        elif wtype == 1:
            value = buf[pos:pos + 8]
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            value = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:
            value = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, value


def _packed_varints(value: Union[int, bytes], wtype: int) -> List[int]:
    """A repeated varint field, packed (wire 2) or single element (wire 0)."""
    if wtype == 0:
        return [_signed64(value)]
    out = []
    pos = 0
    while pos < len(value):
        v, pos = _read_varint(value, pos)
        out.append(_signed64(v))
    return out


def _packed_f32(value: Union[bytes], wtype: int) -> List[float]:
    if wtype == 5:
        return [struct.unpack("<f", value)[0]]
    return list(np.frombuffer(value, "<f4"))


def _tag(fnum: int, wtype: int) -> bytes:
    return _write_varint((fnum << 3) | wtype)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _write_varint(len(payload)) + payload


def _str_field(fnum: int, s: str) -> bytes:
    return _len_field(fnum, s.encode("utf-8"))


def _varint_field(fnum: int, v: int) -> bytes:
    return _tag(fnum, 0) + _write_varint(v)


# ------------------------------------------------------------------ messages


@dataclass
class TensorP:
    """onnx.TensorProto: name=8, dims=1, data_type=2, raw_data=9,
    float_data=4 [packed], int32_data=5, int64_data=7 [packed], double_data=10."""

    name: str = ""
    dims: Tuple[int, ...] = ()
    data_type: int = FLOAT
    _raw: bytes = b""
    _float_data: List[float] = field(default_factory=list)
    _int_data: List[int] = field(default_factory=list)

    @classmethod
    def decode(cls, buf: bytes) -> "TensorP":
        t = cls()
        dims: List[int] = []
        for fnum, wtype, value in _fields(buf):
            if fnum == 1:
                dims.extend(_packed_varints(value, wtype))
            elif fnum == 2:
                t.data_type = value
            elif fnum == 4:
                t._float_data.extend(_packed_f32(value, wtype))
            elif fnum in (5, 7):
                t._int_data.extend(_packed_varints(value, wtype))
            elif fnum == 8:
                t.name = value.decode("utf-8")
            elif fnum == 9:
                t._raw = value
        t.dims = tuple(dims)
        return t

    def to_numpy(self) -> np.ndarray:
        if self.data_type == BFLOAT16:  # raw only; view as uint16 -> f32
            # checked BEFORE the dtype-table lookup: bf16 has no numpy dtype,
            # so the table miss used to make this branch unreachable
            raw = np.frombuffer(self._raw, "<u2").astype(np.uint32) << 16
            return raw.view(np.float32).reshape(self.dims)
        np_dtype = _DTYPE_TO_NP.get(self.data_type)
        if np_dtype is None:
            raise ValueError(f"unsupported tensor data_type {self.data_type}"
                             f" for initializer {self.name!r}")
        if self._raw:
            return np.frombuffer(self._raw, np.dtype(np_dtype).newbyteorder("<")
                                 ).reshape(self.dims).astype(np_dtype)
        if self._float_data:
            return np.asarray(self._float_data, np.float32).reshape(self.dims)
        if self._int_data:
            return np.asarray(self._int_data, np_dtype).reshape(self.dims)
        if int(np.prod(self.dims)) != 0:
            # No payload but a non-empty shape: the initializer's data lives
            # elsewhere (ONNX external data, data_location=EXTERNAL). Zeros
            # here would convert cleanly AND self-validate (the numpy-executor
            # cross-check reads the same zeros) — fail loudly instead.
            raise ValueError(
                f"initializer {self.name!r} has shape {self.dims} but no "
                "inline payload — ONNX external data is not supported; "
                "re-save the model with save_as_external_data=False")
        return np.zeros(self.dims, np_dtype)

    @classmethod
    def from_numpy(cls, name: str, arr: np.ndarray) -> "TensorP":
        arr = np.ascontiguousarray(arr)
        dtype = _NP_TO_DTYPE.get(arr.dtype)
        if dtype is None:
            raise ValueError(f"unsupported numpy dtype {arr.dtype}")
        t = cls(name=name, dims=tuple(arr.shape), data_type=dtype)
        t._raw = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
        return t

    def encode(self) -> bytes:
        out = bytearray()
        for d in self.dims:
            out += _varint_field(1, d)
        out += _varint_field(2, self.data_type)
        out += _str_field(8, self.name)
        out += _len_field(9, self._raw)
        return bytes(out)


@dataclass
class AttrP:
    """onnx.AttributeProto: name=1, f=2, i=3, s=4, t=5, floats=7, ints=8, type=20."""

    name: str = ""
    type: int = 0
    f: float = 0.0
    i: int = 0
    s: bytes = b""
    t: Optional[TensorP] = None
    floats: List[float] = field(default_factory=list)
    ints: List[int] = field(default_factory=list)

    @property
    def value(self):
        return {ATTR_FLOAT: self.f, ATTR_INT: self.i, ATTR_STRING: self.s,
                ATTR_TENSOR: self.t, ATTR_FLOATS: self.floats,
                ATTR_INTS: self.ints}.get(self.type)

    @classmethod
    def decode(cls, buf: bytes) -> "AttrP":
        a = cls()
        for fnum, wtype, value in _fields(buf):
            if fnum == 1:
                a.name = value.decode("utf-8")
            elif fnum == 2:
                a.f = struct.unpack("<f", value)[0]
            elif fnum == 3:
                a.i = _signed64(value)
            elif fnum == 4:
                a.s = value
            elif fnum == 5:
                a.t = TensorP.decode(value)
            elif fnum == 7:
                a.floats.extend(_packed_f32(value, wtype))
            elif fnum == 8:
                a.ints.extend(_packed_varints(value, wtype))
            elif fnum == 20:
                a.type = value
        return a

    def encode(self) -> bytes:
        out = bytearray(_str_field(1, self.name))
        if self.type == ATTR_FLOAT:
            out += _tag(2, 5) + struct.pack("<f", self.f)
        elif self.type == ATTR_INT:
            out += _varint_field(3, self.i)
        elif self.type == ATTR_STRING:
            out += _len_field(4, self.s)
        elif self.type == ATTR_TENSOR:
            out += _len_field(5, self.t.encode())
        elif self.type == ATTR_FLOATS:
            for v in self.floats:
                out += _tag(7, 5) + struct.pack("<f", v)
        elif self.type == ATTR_INTS:
            for v in self.ints:
                out += _varint_field(8, v)
        out += _varint_field(20, self.type)
        return bytes(out)

    @classmethod
    def make(cls, name: str, value) -> "AttrP":
        a = cls(name=name)
        if isinstance(value, float):
            a.type, a.f = ATTR_FLOAT, value
        elif isinstance(value, bool) or isinstance(value, int):
            a.type, a.i = ATTR_INT, int(value)
        elif isinstance(value, str):
            a.type, a.s = ATTR_STRING, value.encode("utf-8")
        elif isinstance(value, bytes):
            a.type, a.s = ATTR_STRING, value
        elif isinstance(value, TensorP):
            a.type, a.t = ATTR_TENSOR, value
        elif isinstance(value, (list, tuple)) and value and isinstance(value[0], float):
            a.type, a.floats = ATTR_FLOATS, list(value)
        elif isinstance(value, (list, tuple)):
            a.type, a.ints = ATTR_INTS, [int(v) for v in value]
        else:
            raise TypeError(f"cannot build attribute from {type(value)}")
        return a


@dataclass
class NodeP:
    """onnx.NodeProto: input=1, output=2, name=3, op_type=4, attribute=5, domain=7."""

    op_type: str = ""
    inputs: List[str] = field(default_factory=list)
    outputs: List[str] = field(default_factory=list)
    name: str = ""
    attributes: Dict[str, AttrP] = field(default_factory=dict)

    def attr(self, name: str, default=None):
        a = self.attributes.get(name)
        return a.value if a is not None else default

    @classmethod
    def decode(cls, buf: bytes) -> "NodeP":
        n = cls()
        for fnum, _wtype, value in _fields(buf):
            if fnum == 1:
                n.inputs.append(value.decode("utf-8"))
            elif fnum == 2:
                n.outputs.append(value.decode("utf-8"))
            elif fnum == 3:
                n.name = value.decode("utf-8")
            elif fnum == 4:
                n.op_type = value.decode("utf-8")
            elif fnum == 5:
                a = AttrP.decode(value)
                n.attributes[a.name] = a
        return n

    def encode(self) -> bytes:
        out = bytearray()
        for s in self.inputs:
            out += _str_field(1, s)
        for s in self.outputs:
            out += _str_field(2, s)
        out += _str_field(3, self.name)
        out += _str_field(4, self.op_type)
        for a in self.attributes.values():
            out += _len_field(5, a.encode())
        return bytes(out)


def _value_info(name: str, dims: Tuple[Optional[int], ...],
                elem_type: int = FLOAT) -> bytes:
    """ValueInfoProto{name=1, type=2{tensor_type=1{elem_type=1, shape=2{dim=1}}}}."""
    shape = bytearray()
    for d in dims:
        dim = _varint_field(1, d) if d is not None else _str_field(2, "N")
        shape += _len_field(1, dim)
    tensor_type = _varint_field(1, elem_type) + _len_field(2, bytes(shape))
    type_proto = _len_field(1, tensor_type)
    return _str_field(1, name) + _len_field(2, type_proto)


def _decode_value_info(buf: bytes) -> Tuple[str, Tuple[Optional[int], ...]]:
    name, dims = "", []
    for fnum, _w, value in _fields(buf):
        if fnum == 1:
            name = value.decode("utf-8")
        elif fnum == 2:
            for f2, _w2, v2 in _fields(value):
                if f2 != 1:  # tensor_type
                    continue
                for f3, _w3, v3 in _fields(v2):
                    if f3 != 2:  # shape
                        continue
                    for f4, _w4, v4 in _fields(v3):
                        if f4 != 1:  # dim
                            continue
                        dim_value = None
                        for f5, _w5, v5 in _fields(v4):
                            if f5 == 1:
                                dim_value = v5
                        dims.append(dim_value)
    return name, tuple(dims)


@dataclass
class GraphP:
    """onnx.GraphProto: node=1, name=2, initializer=5, input=11, output=12."""

    name: str = "graph"
    nodes: List[NodeP] = field(default_factory=list)
    initializers: Dict[str, np.ndarray] = field(default_factory=dict)
    inputs: List[Tuple[str, Tuple[Optional[int], ...]]] = field(default_factory=list)
    outputs: List[Tuple[str, Tuple[Optional[int], ...]]] = field(default_factory=list)

    @classmethod
    def decode(cls, buf: bytes) -> "GraphP":
        g = cls()
        for fnum, _wtype, value in _fields(buf):
            if fnum == 1:
                g.nodes.append(NodeP.decode(value))
            elif fnum == 2:
                g.name = value.decode("utf-8")
            elif fnum == 5:
                t = TensorP.decode(value)
                g.initializers[t.name] = t.to_numpy()
            elif fnum == 11:
                g.inputs.append(_decode_value_info(value))
            elif fnum == 12:
                g.outputs.append(_decode_value_info(value))
        return g

    def encode(self) -> bytes:
        out = bytearray()
        for n in self.nodes:
            out += _len_field(1, n.encode())
        out += _str_field(2, self.name)
        for name, arr in self.initializers.items():
            out += _len_field(5, TensorP.from_numpy(name, arr).encode())
        for name, dims in self.inputs:
            out += _len_field(11, _value_info(name, dims))
        for name, dims in self.outputs:
            out += _len_field(12, _value_info(name, dims))
        return bytes(out)


@dataclass
class ModelP:
    """onnx.ModelProto: ir_version=1, producer_name=2, graph=7, opset_import=8."""

    graph: GraphP = field(default_factory=GraphP)
    ir_version: int = 8
    opset: int = 17
    producer_name: str = "aiis-tpu"

    @classmethod
    def decode(cls, buf: bytes) -> "ModelP":
        m = cls()
        for fnum, _wtype, value in _fields(buf):
            if fnum == 1:
                m.ir_version = value
            elif fnum == 2:
                m.producer_name = value.decode("utf-8")
            elif fnum == 7:
                m.graph = GraphP.decode(value)
            elif fnum == 8:
                for f2, _w2, v2 in _fields(value):
                    if f2 == 2:
                        m.opset = v2
        return m

    def encode(self) -> bytes:
        opset = _str_field(1, "") + _varint_field(2, self.opset)
        return (_varint_field(1, self.ir_version)
                + _str_field(2, self.producer_name)
                + _len_field(7, self.graph.encode())
                + _len_field(8, opset))


def load_model(path: str) -> ModelP:
    with open(path, "rb") as f:
        return ModelP.decode(f.read())


def save_model(model: ModelP, path: str) -> None:
    with open(path, "wb") as f:
        f.write(model.encode())
