"""Minimal .caffemodel (Caffe NetParameter protobuf) reader/writer.

Closes the one remaining interop asymmetry with the reference: its replay
snapshots cross (runtime/replay_io.py) but its trained weights did not.
The reference snapshots actors/critics as .caffemodel files
(/root/reference/src/dqn.cpp:582-620) and evaluates given actor weights
via --actor_weights (/root/reference/src/dqn_main.cpp:23-24, 558-580).
This module parses those files without a protobuf dependency — the wire
format is simple tag-length-value — and maps the InnerProduct layer blobs
onto this framework's parameter pytrees.

Reference net layer inventory (dqn.cpp:404-454):
  Actor : ip1_layer..ipN_layer (tower), action_layer (4 outputs),
          actionpara_layer (6 outputs)
  Critic: ip1_layer..ipN_layer over concat(state, actions, params),
          q_values_layer (1 output)
Each InnerProduct layer carries two blobs: weight (out, in) — transposed
vs this framework's (in, out) — and bias (out,).

Message schema used (caffe.proto):
  NetParameter: name=1 (string), layer=100 (LayerParameter, repeated),
                layers=2 (V1LayerParameter, legacy, repeated)
  LayerParameter: name=1, type=2 (string), blobs=7 (BlobProto)
  V1LayerParameter: name=4, type=5 (enum), blobs=6 (BlobProto)
  BlobProto: num=1 channels=2 height=3 width=4 (legacy shape),
             data=5 (repeated float, packed), shape=7 (BlobShape)
  BlobShape: dim=1 (repeated int64, packed)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Protobuf wire-format primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated varint (unexpected end of file)")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a serialized message.
    wire 0 -> int, wire 1 -> 8 raw bytes, wire 2 -> memoryview,
    wire 5 -> 4 raw bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            if pos + 8 > n:
                raise ValueError("truncated fixed64 field")
            val = bytes(buf[pos:pos + 8])
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError(
                    f"truncated length-delimited field {field}: declares "
                    f"{ln} bytes, {n - pos} remain")
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > n:
                raise ValueError("truncated fixed32 field")
            val = bytes(buf[pos:pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _write_varint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_tag(out: bytearray, field: int, wire: int):
    _write_varint(out, (field << 3) | wire)


def _write_len_delimited(out: bytearray, field: int, payload: bytes):
    _write_tag(out, field, 2)
    _write_varint(out, len(payload))
    out += payload


# ---------------------------------------------------------------------------
# BlobProto / LayerParameter / NetParameter
# ---------------------------------------------------------------------------


def _parse_blob(buf: memoryview) -> np.ndarray:
    dims: List[int] = []
    legacy = {}
    data = []
    for field, wire, val in _iter_fields(buf):
        if field == 7 and wire == 2:          # shape: BlobShape
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    if w2 == 2:               # packed int64
                        p = 0
                        while p < len(v2):
                            d, p = _read_varint(v2, p)
                            dims.append(d)
                    else:
                        dims.append(v2)
        elif field == 5:                      # data: repeated float
            if wire == 2:                     # packed
                data.append(np.frombuffer(bytes(val), dtype="<f4"))
            elif wire == 5:                   # unpacked entry
                data.append(np.frombuffer(val, dtype="<f4"))
        elif field in (1, 2, 3, 4) and wire == 0:   # legacy num/ch/h/w
            legacy[field] = val
    arr = (np.concatenate(data) if data
           else np.zeros(0, np.float32)).astype(np.float32)
    if not dims and legacy:
        dims = [legacy.get(i, 1) for i in (1, 2, 3, 4)]
        # Squeeze leading 1s but never below 2-D: an IP weight blob is
        # legacy (1, 1, out, in) and must keep its (out, in) axes even
        # when out == 1 (e.g. the critic q_values_layer) — squeezing to
        # 1-D would silently transpose it downstream.
        while len(dims) > 2 and dims[0] == 1:
            dims.pop(0)
    if dims:
        if int(np.prod(dims)) != arr.size:
            raise ValueError(
                f"blob declares shape {dims} ({int(np.prod(dims))} floats) "
                f"but carries {arr.size} data entries — corrupt blob")
        arr = arr.reshape(dims)
    return arr


def _parse_layer(buf: memoryview, legacy: bool) -> Dict[str, Any]:
    name_f, type_f, blobs_f = (4, 5, 6) if legacy else (1, 2, 7)
    out: Dict[str, Any] = {"name": "", "type": "", "blobs": []}
    for field, wire, val in _iter_fields(buf):
        if field == name_f and wire == 2:
            out["name"] = bytes(val).decode("utf-8", "replace")
        elif field == type_f:
            out["type"] = (bytes(val).decode("utf-8", "replace")
                           if wire == 2 else int(val))
        elif field == blobs_f and wire == 2:
            out["blobs"].append(_parse_blob(val))
    return out


def read_netparameter(path: str) -> Dict[str, Any]:
    """Parse a .caffemodel into {'name': str, 'layers': [layer dicts]}."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    net: Dict[str, Any] = {"name": "", "layers": []}
    for field, wire, val in _iter_fields(buf):
        if field == 1 and wire == 2:
            net["name"] = bytes(val).decode("utf-8", "replace")
        elif field == 100 and wire == 2:      # modern LayerParameter
            net["layers"].append(_parse_layer(val, legacy=False))
        elif field == 2 and wire == 2:        # legacy V1LayerParameter
            net["layers"].append(_parse_layer(val, legacy=True))
    return net


def _serialize_blob(arr: np.ndarray) -> bytes:
    out = bytearray()
    shape = bytearray()
    for d in arr.shape:
        _write_tag(shape, 1, 0)
        _write_varint(shape, d)
    _write_len_delimited(out, 7, bytes(shape))
    _write_len_delimited(
        out, 5, arr.astype("<f4").reshape(-1).tobytes())
    return bytes(out)


def _serialize_layer(name: str, type_: str, blobs: List[np.ndarray]) -> bytes:
    out = bytearray()
    _write_len_delimited(out, 1, name.encode())
    _write_len_delimited(out, 2, type_.encode())
    for b in blobs:
        _write_len_delimited(out, 7, _serialize_blob(b))
    return bytes(out)


def write_netparameter(path: str, name: str,
                       layers: List[Tuple[str, str, List[np.ndarray]]]):
    """Write a NetParameter with the given (name, type, blobs) layers."""
    out = bytearray()
    _write_len_delimited(out, 1, name.encode())
    for lname, ltype, blobs in layers:
        _write_len_delimited(out, 100, _serialize_layer(lname, ltype, blobs))
    with open(path, "wb") as f:
        f.write(bytes(out))


# ---------------------------------------------------------------------------
# Mapping to this framework's parameter pytrees
# ---------------------------------------------------------------------------


def _ip_layers(net: Dict[str, Any]) -> Dict[str, List[np.ndarray]]:
    """Name -> blobs for every parameter-bearing layer."""
    return {l["name"]: l["blobs"] for l in net["layers"] if l["blobs"]}


def _linear_from_blobs(blobs: List[np.ndarray]) -> Dict[str, np.ndarray]:
    w = blobs[0]
    w = w.reshape(w.shape[0], -1)         # caffe IP weight: (out, in)
    b = (blobs[1].reshape(-1) if len(blobs) > 1
         else np.zeros(w.shape[0], np.float32))
    return {"w": np.ascontiguousarray(w.T), "b": b}   # ours: (in, out)


def actor_params_from_caffemodel(path: str) -> Dict[str, Any]:
    """Map an actor .caffemodel (ip*_layer tower + action_layer +
    actionpara_layer, dqn.cpp:418-429) onto the actor pytree."""
    ips = _ip_layers(read_netparameter(path))
    tower = []
    i = 1
    while f"ip{i}_layer" in ips:
        tower.append(_linear_from_blobs(ips[f"ip{i}_layer"]))
        i += 1
    if not tower:
        raise ValueError(f"{path}: no ip*_layer InnerProduct blobs found")
    for head in ("action_layer", "actionpara_layer"):
        if head not in ips:
            raise ValueError(f"{path}: missing {head}; not an actor net?")
    return {
        "tower": tower,
        "action_head": _linear_from_blobs(ips["action_layer"]),
        "param_head": _linear_from_blobs(ips["actionpara_layer"]),
    }


def critic_params_from_caffemodel(path: str) -> Dict[str, Any]:
    """Map a critic .caffemodel (ip*_layer tower + q_values_layer,
    dqn.cpp:431-454) onto the critic pytree."""
    ips = _ip_layers(read_netparameter(path))
    tower = []
    i = 1
    while f"ip{i}_layer" in ips:
        tower.append(_linear_from_blobs(ips[f"ip{i}_layer"]))
        i += 1
    if not tower:
        raise ValueError(f"{path}: no ip*_layer InnerProduct blobs found")
    if "q_values_layer" not in ips:
        raise ValueError(f"{path}: missing q_values_layer; not a critic?")
    return {
        "tower": tower,
        "q_head": _linear_from_blobs(ips["q_values_layer"]),
    }


def _np_linear(p) -> List[np.ndarray]:
    return [np.ascontiguousarray(np.asarray(p["w"], np.float32).T),
            np.asarray(p["b"], np.float32)]


def write_actor_caffemodel(path: str, params: Dict[str, Any]):
    """Export an actor pytree in the reference's .caffemodel layout."""
    layers = []
    for i, p in enumerate(params["tower"], start=1):
        layers.append((f"ip{i}_layer", "InnerProduct", _np_linear(p)))
    layers.append(("action_layer", "InnerProduct",
                   _np_linear(params["action_head"])))
    layers.append(("actionpara_layer", "InnerProduct",
                   _np_linear(params["param_head"])))
    write_netparameter(path, "Actor", layers)


def write_critic_caffemodel(path: str, params: Dict[str, Any]):
    layers = []
    for i, p in enumerate(params["tower"], start=1):
        layers.append((f"ip{i}_layer", "InnerProduct", _np_linear(p)))
    layers.append(("q_values_layer", "InnerProduct",
                   _np_linear(params["q_head"])))
    write_netparameter(path, "Critic", layers)
