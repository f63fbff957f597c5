"""Minimal ONNX weight importer (no ``onnx``/``onnxruntime`` dependency).

The reference executes ``data/nsnet2-20ms-baseline.onnx`` via ONNX Runtime
(``src/NSNet2.zig:53-112``); our framework re-implements the network in JAX
(``nsnet2.py``) and only needs the *weights* out of the ONNX file.  This
module contains a small protobuf wire-format reader plus just enough of the
ONNX schema (ModelProto/GraphProto/NodeProto/TensorProto/AttributeProto)
to extract initializers and node topology, and a mapper that matches the
NSNet2 baseline graph shape onto ``NSNet2Params``.

Note: the reference repo's copy of the ONNX file is an absent git-LFS blob
(``/root/reference/.MISSING_LARGE_BLOBS``).  This importer is exercised in
tests against a synthetic ONNX file serialized by ``export_nsnet2_onnx``
(which doubles as the real export path: weights trained here can be handed
back to any ONNX Runtime consumer, including the original reference).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator

import jax.numpy as jnp
import numpy as np

from .nsnet2 import GRUParams, NSNet2Params

# ---------------------------------------------------------------------------
# Protobuf wire format
# ---------------------------------------------------------------------------

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for each field in a message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 0x7
        if wtype == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wtype == _WT_I64:
            val = buf[pos : pos + 8]
            pos += 8
        elif wtype == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == _WT_I32:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def _write_tag(fnum: int, wtype: int) -> bytes:
    return _encode_varint((fnum << 3) | wtype)


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _write_tag(fnum, _WT_LEN) + _encode_varint(len(payload)) + payload


# ---------------------------------------------------------------------------
# ONNX schema subset
# ---------------------------------------------------------------------------

_DTYPES = {1: np.float32, 6: np.int32, 7: np.int64, 11: np.float64, 10: np.float16}


@dataclass
class OnnxTensor:
    name: str = ""
    dims: tuple[int, ...] = ()
    data_type: int = 1
    array: np.ndarray | None = None


@dataclass
class OnnxAttr:
    name: str = ""
    i: int | None = None
    f: float | None = None
    ints: tuple[int, ...] = ()
    t: OnnxTensor | None = None
    s: bytes | None = None


@dataclass
class OnnxNode:
    op_type: str = ""
    name: str = ""
    inputs: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)
    attrs: dict[str, OnnxAttr] = field(default_factory=dict)


@dataclass
class OnnxGraph:
    nodes: list[OnnxNode] = field(default_factory=list)
    initializers: dict[str, np.ndarray] = field(default_factory=dict)
    input_names: list[str] = field(default_factory=list)
    output_names: list[str] = field(default_factory=list)


def _parse_tensor(buf: bytes) -> OnnxTensor:
    t = OnnxTensor()
    dims: list[int] = []
    float_data: list[float] = []
    int_data: list[int] = []
    raw = b""
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1:  # dims (repeated int64)
            if wtype == _WT_VARINT:
                dims.append(int(val))
            else:  # packed
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    dims.append(v)
        elif fnum == 2 and wtype == _WT_VARINT:
            t.data_type = int(val)
        elif fnum == 4:  # float_data
            if wtype == _WT_I32:
                float_data.append(struct.unpack("<f", val)[0])
            else:  # packed
                float_data.extend(struct.unpack(f"<{len(val)//4}f", val))
        elif fnum == 7:  # int64_data
            if wtype == _WT_VARINT:
                int_data.append(int(val))
            else:
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    int_data.append(v)
        elif fnum == 8 and wtype == _WT_LEN:
            t.name = val.decode("utf-8")
        elif fnum == 9 and wtype == _WT_LEN:
            raw = bytes(val)
    t.dims = tuple(dims)
    dtype = _DTYPES.get(t.data_type, np.float32)
    if raw:
        arr = np.frombuffer(raw, dtype=dtype)
    elif float_data:
        arr = np.asarray(float_data, dtype=np.float32)
    elif int_data:
        arr = np.asarray(int_data, dtype=np.int64)
    else:
        arr = np.zeros(0, dtype=dtype)
    if t.dims:
        arr = arr.reshape(t.dims)
    t.array = arr
    return t


def _parse_attr(buf: bytes) -> OnnxAttr:
    a = OnnxAttr()
    ints: list[int] = []
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1 and wtype == _WT_LEN:
            a.name = val.decode("utf-8")
        elif fnum == 2 and wtype == _WT_I32:
            a.f = struct.unpack("<f", val)[0]
        elif fnum == 3 and wtype == _WT_VARINT:
            # sint not used by ONNX attrs; plain int64 varint
            a.i = int(val)
        elif fnum == 4 and wtype == _WT_LEN:
            a.s = bytes(val)
        elif fnum == 5 and wtype == _WT_LEN:
            a.t = _parse_tensor(val)
        elif fnum == 8:
            if wtype == _WT_VARINT:
                ints.append(int(val))
            else:
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    ints.append(v)
    a.ints = tuple(ints)
    return a


def _parse_node(buf: bytes) -> OnnxNode:
    n = OnnxNode()
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1 and wtype == _WT_LEN:
            n.inputs.append(val.decode("utf-8"))
        elif fnum == 2 and wtype == _WT_LEN:
            n.outputs.append(val.decode("utf-8"))
        elif fnum == 3 and wtype == _WT_LEN:
            n.name = val.decode("utf-8")
        elif fnum == 4 and wtype == _WT_LEN:
            n.op_type = val.decode("utf-8")
        elif fnum == 5 and wtype == _WT_LEN:
            a = _parse_attr(val)
            n.attrs[a.name] = a
    return n


def _parse_value_info_name(buf: bytes) -> str:
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1 and wtype == _WT_LEN:
            return val.decode("utf-8")
    return ""


def _parse_graph(buf: bytes) -> OnnxGraph:
    g = OnnxGraph()
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1 and wtype == _WT_LEN:
            g.nodes.append(_parse_node(val))
        elif fnum == 5 and wtype == _WT_LEN:
            t = _parse_tensor(val)
            g.initializers[t.name] = t.array
        elif fnum == 11 and wtype == _WT_LEN:
            g.input_names.append(_parse_value_info_name(val))
        elif fnum == 12 and wtype == _WT_LEN:
            g.output_names.append(_parse_value_info_name(val))
    return g


def parse_model(data: bytes) -> OnnxGraph:
    """Parse an ONNX ModelProto byte string into an OnnxGraph."""
    for fnum, wtype, val in _iter_fields(data):
        if fnum == 7 and wtype == _WT_LEN:  # ModelProto.graph
            return _parse_graph(val)
    raise ValueError("no graph found in ONNX model")


def parse_model_file(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        return parse_model(f.read())


# ---------------------------------------------------------------------------
# NSNet2 graph mapping
# ---------------------------------------------------------------------------

_SHAPE_OPS = {"Squeeze", "Unsqueeze", "Reshape", "Transpose", "Identity", "Cast", "Flatten"}


def _resolve_linear(node: OnnxNode, g: OnnxGraph, pending_out: dict) -> tuple[np.ndarray, np.ndarray]:
    """Extract (w [in,out], b [out]) from a Gemm or MatMul(+Add) node."""
    init = g.initializers
    if node.op_type == "Gemm":
        w = init[node.inputs[1]]
        trans_b = node.attrs.get("transB")
        if trans_b is not None and trans_b.i:
            w = w.T
        b = init[node.inputs[2]] if len(node.inputs) > 2 else np.zeros(w.shape[1], np.float32)
        return np.ascontiguousarray(w, np.float32), np.asarray(b, np.float32).reshape(-1)
    if node.op_type == "MatMul":
        w = init[node.inputs[1]]
        # A following Add with an initializer operand supplies the bias.
        b = pending_out.get(node.outputs[0])
        if b is None:
            b = np.zeros(w.shape[1], np.float32)
        return np.ascontiguousarray(w, np.float32), np.asarray(b, np.float32).reshape(-1)
    raise ValueError(f"not a linear node: {node.op_type}")


def _gru_from_node(node: OnnxNode, g: OnnxGraph) -> GRUParams:
    init = g.initializers
    w = init[node.inputs[1]]  # [1, 3H, in] gates z|r|h
    r = init[node.inputs[2]]  # [1, 3H, H]
    hidden = r.shape[-1]
    if len(node.inputs) > 3 and node.inputs[3] in init:
        b = init[node.inputs[3]].reshape(-1)  # [6H]: Wb(zrh) | Rb(zrh)
        bi, bh = b[: 3 * hidden], b[3 * hidden :]
    else:
        bi = np.zeros(3 * hidden, np.float32)
        bh = np.zeros(3 * hidden, np.float32)
    lbr_attr = node.attrs.get("linear_before_reset")
    lbr = int(lbr_attr.i) if (lbr_attr is not None and lbr_attr.i is not None) else 0
    return GRUParams(
        wi=jnp.asarray(np.ascontiguousarray(w[0].T, np.float32)),
        wh=jnp.asarray(np.ascontiguousarray(r[0].T, np.float32)),
        bi=jnp.asarray(np.asarray(bi, np.float32)),
        bh=jnp.asarray(np.asarray(bh, np.float32)),
        linear_before_reset=lbr,
    )


def load_nsnet2_graph(g: OnnxGraph) -> NSNet2Params:
    """Map the NSNet2 baseline graph (Dense, GRU, GRU, Dense+ReLU x2,
    Dense+Sigmoid) onto NSNet2Params.  Shape-only ops are skipped; MatMul+Add
    pairs are fused into one linear layer."""
    init = g.initializers

    # Pre-pass: map MatMul output -> bias from a following Add(initializer).
    matmul_bias: dict[str, np.ndarray] = {}
    for node in g.nodes:
        if node.op_type == "Add":
            const_in = [i for i in node.inputs if i in init]
            dyn_in = [i for i in node.inputs if i not in init]
            if len(const_in) == 1 and len(dyn_in) == 1:
                matmul_bias[dyn_in[0]] = init[const_in[0]]

    linears: list[tuple[np.ndarray, np.ndarray]] = []
    grus: list[GRUParams] = []
    for node in g.nodes:
        if node.op_type in ("Gemm", "MatMul"):
            linears.append(_resolve_linear(node, g, matmul_bias))
        elif node.op_type == "GRU":
            grus.append(_gru_from_node(node, g))
        elif node.op_type in _SHAPE_OPS or node.op_type in ("Add", "Relu", "Sigmoid"):
            continue
        # Anything else is ignored; the NSNet2 baseline contains nothing else.

    if len(grus) != 2 or len(linears) != 4:
        raise ValueError(
            f"unexpected NSNet2 graph shape: {len(linears)} linear layers, {len(grus)} GRUs"
        )
    (w0, b0), (w1, b1), (w2, b2), (w3, b3) = linears
    return NSNet2Params(
        fc_in_w=jnp.asarray(w0), fc_in_b=jnp.asarray(b0),
        gru1=grus[0], gru2=grus[1],
        ff1_w=jnp.asarray(w1), ff1_b=jnp.asarray(b1),
        ff2_w=jnp.asarray(w2), ff2_b=jnp.asarray(b2),
        out_w=jnp.asarray(w3), out_b=jnp.asarray(b3),
    )


def load_nsnet2_onnx(path: str) -> NSNet2Params:
    return load_nsnet2_graph(parse_model_file(path))


# ---------------------------------------------------------------------------
# Test-support: serialize a synthetic NSNet2 ONNX model (same graph shape as
# the Microsoft baseline export) so the importer can be exercised without the
# missing upstream blob.
# ---------------------------------------------------------------------------


def _ser_tensor(name: str, arr: np.ndarray) -> bytes:
    arr32 = np.asarray(arr, np.float32)
    out = b""
    for d in arr32.shape:
        out += _write_tag(1, _WT_VARINT) + _encode_varint(d)
    out += _write_tag(2, _WT_VARINT) + _encode_varint(1)  # float32
    out += _len_field(9, arr32.tobytes())
    out += _len_field(8, name.encode())
    return out


def _ser_attr_int(name: str, value: int) -> bytes:
    return _len_field(5, _len_field(1, name.encode()) + _write_tag(3, _WT_VARINT) + _encode_varint(value))


def _ser_node(op: str, inputs: list[str], outputs: list[str], attrs: bytes = b"") -> bytes:
    out = b""
    for i in inputs:
        out += _len_field(1, i.encode())
    for o in outputs:
        out += _len_field(2, o.encode())
    out += _len_field(4, op.encode())
    out += attrs
    return out


def export_nsnet2_onnx(params: NSNet2Params) -> bytes:
    """Serialize ``params`` as a real ONNX model with the baseline graph
    layout (Gemm, GRU x2, Gemm+Relu x2, Gemm+Sigmoid) — weights trained here
    round-trip to ONNX Runtime consumers, including the original reference
    (src/NSNet2.zig loads exactly this graph shape). Also used by the import
    round-trip tests."""

    def np_(x):
        return np.asarray(x, np.float32)

    inits = b""
    inits += _len_field(5, _ser_tensor("fc_in_w", np_(params.fc_in_w).T))  # Gemm transB=1
    inits += _len_field(5, _ser_tensor("fc_in_b", np_(params.fc_in_b)))
    for name, gru_p in (("gru1", params.gru1), ("gru2", params.gru2)):
        inits += _len_field(5, _ser_tensor(f"{name}_W", np_(gru_p.wi).T[None]))
        inits += _len_field(5, _ser_tensor(f"{name}_R", np_(gru_p.wh).T[None]))
        b6 = np.concatenate([np_(gru_p.bi), np_(gru_p.bh)])[None]
        inits += _len_field(5, _ser_tensor(f"{name}_B", b6))
    for i, (w, b) in enumerate(
        [(params.ff1_w, params.ff1_b), (params.ff2_w, params.ff2_b), (params.out_w, params.out_b)]
    ):
        inits += _len_field(5, _ser_tensor(f"ff{i}_w", np_(w).T))
        inits += _len_field(5, _ser_tensor(f"ff{i}_b", np_(b)))

    gemm_attrs = _ser_attr_int("transB", 1)
    lbr = _ser_attr_int("linear_before_reset", params.gru1.linear_before_reset)
    nodes = [
        _ser_node("Gemm", ["input", "fc_in_w", "fc_in_b"], ["x0"], gemm_attrs),
        _ser_node("GRU", ["x0", "gru1_W", "gru1_R", "gru1_B"], ["x1"], lbr),
        _ser_node("Squeeze", ["x1"], ["x1s"]),
        _ser_node("GRU", ["x1s", "gru2_W", "gru2_R", "gru2_B"], ["x2"], lbr),
        _ser_node("Squeeze", ["x2"], ["x2s"]),
        _ser_node("Gemm", ["x2s", "ff0_w", "ff0_b"], ["x3"], gemm_attrs),
        _ser_node("Relu", ["x3"], ["x4"]),
        _ser_node("Gemm", ["x4", "ff1_w", "ff1_b"], ["x5"], gemm_attrs),
        _ser_node("Relu", ["x5"], ["x6"]),
        _ser_node("Gemm", ["x6", "ff2_w", "ff2_b"], ["x7"], gemm_attrs),
        _ser_node("Sigmoid", ["x7"], ["output"]),
    ]
    graph = b"".join(_len_field(1, n) for n in nodes) + inits
    return _len_field(7, graph)
