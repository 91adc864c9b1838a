"""Reference-compatible binary model / feature-matrix I/O (numpy).

Both formats are streams of big-endian 4-byte ints and floats, matching what
Java's DataOutputStream writes (/root/reference/src/java/suskun/nn/
FeedForwardNetwork.java:226-235,331-340) and what the C++ BinaryLoader reads
(/root/reference/src/cpp/float_dnn.cc:18-69,166-212).

Model stream:
    int32 layer_count
    repeat layer_count times:
        int32 input_dim
        int32 output_dim
        f32 weights[output_dim][input_dim]   (row-major, node-major)
        f32 bias[output_dim]
    f32 shift[first_layer_input_dim]
    f32 scale[first_layer_input_dim]

Feature-matrix stream (/root/reference/src/java/suskun/nn/BatchData.java:80-139,
/root/reference/src/cpp/float_dnn.cc:85-105):
    int32 frame_count
    int32 dim
    f32 data[frame_count][dim]

Readers trust the header frame count; the bundled data/16khz.bin contains one
trailing extra frame beyond its header due to a writer off-by-one in the
reference (BatchData.java:126-138) which both reference readers ignore, so we
ignore it too (SURVEY.md §2 #23).

If the native C++ IO library is available (fastdnn_tpu.formats.native), the
`read_*` functions below transparently use it for large files.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass
from typing import BinaryIO, List, Union

import numpy as np

PathOrFile = Union[str, os.PathLike, BinaryIO]

_BE_I4 = np.dtype(">i4")
_BE_F4 = np.dtype(">f4")


@dataclass
class RawLayer:
    """One affine layer exactly as stored: weights [out, in] + bias [out]."""

    weights: np.ndarray  # float32 [output_dim, input_dim]
    bias: np.ndarray  # float32 [output_dim]

    @property
    def input_dim(self) -> int:
        return self.weights.shape[1]

    @property
    def output_dim(self) -> int:
        return self.weights.shape[0]


@dataclass
class RawNetwork:
    """A parsed model file: affine layers + input shift/scale vectors."""

    layers: List[RawLayer]
    shift: np.ndarray  # float32 [input_dim]
    scale: np.ndarray  # float32 [input_dim]

    @property
    def input_dim(self) -> int:
        return self.layers[0].input_dim

    @property
    def output_dim(self) -> int:
        return self.layers[-1].output_dim

    def topology(self) -> str:
        """Human-readable topology, e.g. '432-5x2048-8000'.

        Mirrors FloatDnn::PrintTopology (/root/reference/src/cpp/
        float_dnn.cc:71-74) which prints
        input_dim-(hidden_count)x(first_width)-out_dim.
        """
        return (
            f"{self.input_dim}-{len(self.layers) - 2}x"
            f"{self.layers[0].output_dim}-{self.output_dim}"
        )


class _Reader:
    """Cursor over a fully-slurped byte buffer (big-endian by default,
    little-endian via flag — the BinaryLoader endianness switch,
    /root/reference/src/cpp/float_dnn.cc:166,19)."""

    def __init__(self, buf: bytes, little_endian: bool = False):
        self._buf = buf
        self._pos = 0
        self._i4 = np.dtype("<i4") if little_endian else _BE_I4
        self._f4 = np.dtype("<f4") if little_endian else _BE_F4

    def read_i32(self) -> int:
        v = np.frombuffer(self._buf, self._i4, count=1, offset=self._pos)[0]
        self._pos += 4
        return int(v)

    def read_f32_array(self, count: int) -> np.ndarray:
        v = np.frombuffer(self._buf, self._f4, count=count, offset=self._pos)
        self._pos += 4 * count
        return v.astype(np.float32)

    def remaining(self) -> int:
        return len(self._buf) - self._pos


def _slurp(f: PathOrFile) -> bytes:
    if hasattr(f, "read"):
        return f.read()
    with open(f, "rb") as fh:
        return fh.read()


def _native_io():
    """The C++ IO library (native/fastdnn_io.cc) if built, else None."""
    try:
        from . import native

        return native if native.available() else None
    except Exception:
        return None


def read_model(f: PathOrFile, *, little_endian: bool = False) -> RawNetwork:
    """Parse a reference-format binary model file.

    `little_endian` mirrors the reference BinaryLoader's endianness flag
    (/root/reference/src/cpp/float_dnn.cc:166) — the reference always
    constructs it big-endian for models (float_dnn.cc:19), but the flag is
    part of the loader surface.  The native fast path is BE-only.
    """
    if not hasattr(f, "read") and not little_endian:
        nat = _native_io()
        if nat is not None:
            return nat.read_model(f)
    r = _Reader(_slurp(f), little_endian=little_endian)
    layer_count = r.read_i32()
    if not 0 < layer_count < 10_000:
        raise ValueError(f"implausible layer count {layer_count}")
    layers: List[RawLayer] = []
    for _ in range(layer_count):
        input_dim = r.read_i32()
        output_dim = r.read_i32()
        w = r.read_f32_array(input_dim * output_dim).reshape(output_dim, input_dim)
        b = r.read_f32_array(output_dim)
        layers.append(RawLayer(w, b))
    input_dim = layers[0].input_dim
    shift = r.read_f32_array(input_dim)
    scale = r.read_f32_array(input_dim)
    return RawNetwork(layers, shift, scale)


def write_model(net: RawNetwork, f: PathOrFile, *, little_endian: bool = False) -> None:
    """Write a RawNetwork in the reference binary model format."""
    i4 = np.dtype("<i4") if little_endian else _BE_I4
    f4 = np.dtype("<f4") if little_endian else _BE_F4
    out = io.BytesIO()
    out.write(np.array([len(net.layers)], i4).tobytes())
    for layer in net.layers:
        out.write(np.array([layer.input_dim], i4).tobytes())
        out.write(np.array([layer.output_dim], i4).tobytes())
        out.write(np.ascontiguousarray(layer.weights, dtype=np.float32).astype(f4).tobytes())
        out.write(np.ascontiguousarray(layer.bias, dtype=np.float32).astype(f4).tobytes())
    out.write(np.ascontiguousarray(net.shift, dtype=np.float32).astype(f4).tobytes())
    out.write(np.ascontiguousarray(net.scale, dtype=np.float32).astype(f4).tobytes())
    data = out.getvalue()
    if hasattr(f, "write"):
        f.write(data)
    else:
        with open(f, "wb") as fh:
            fh.write(data)


def read_features(f: PathOrFile, *, little_endian: bool = False) -> np.ndarray:
    """Read a binary feature matrix -> float32 [frames, dim].

    Trusts the header frame count (see module docstring).  `little_endian`
    mirrors BatchData.loadRawBinary's endianness flag
    (/root/reference/src/java/suskun/nn/BatchData.java:80-91).
    """
    if not hasattr(f, "read") and not little_endian:
        nat = _native_io()
        if nat is not None:
            return nat.read_features(f)
    buf = _slurp(f)
    i4, f4 = ("<i4", "<f4") if little_endian else (_BE_I4, _BE_F4)
    hdr = np.frombuffer(buf[:8], i4)
    frames, dim = int(hdr[0]), int(hdr[1])
    if frames < 0 or dim <= 0:
        raise ValueError(f"bad feature header: {frames}x{dim}")
    need = 8 + 4 * frames * dim
    if len(buf) < need:
        raise ValueError(f"feature file truncated: need {need} bytes, have {len(buf)}")
    return (
        np.frombuffer(buf[8:need], f4).astype(np.float32).reshape(frames, dim)
    )


def write_features(
    data: np.ndarray, f: PathOrFile, max_frames: int = -1, *, little_endian: bool = False
) -> None:
    """Write a float32 [frames, dim] matrix in the reference binary format.

    `max_frames` caps the written frame count like serializeDataMatrix's
    featureAmount argument (/root/reference/src/java/suskun/nn/
    BatchData.java:101-139); unlike the reference writer, the header and the
    written frames agree exactly (the reference has an off-by-one that
    writes one extra frame past the header; readers trust the header so
    interop is unaffected).  `little_endian` mirrors serializeDataMatrix's
    endianness flag.
    """
    data = np.ascontiguousarray(data, dtype=np.float32)
    if data.ndim != 2:
        raise ValueError("features must be 2-D [frames, dim]")
    frames = data.shape[0] if max_frames < 0 else min(max_frames, data.shape[0])
    i4, f4 = ("<i4", "<f4") if little_endian else (_BE_I4, _BE_F4)
    out = io.BytesIO()
    out.write(np.array([frames], i4).tobytes())
    out.write(np.array([data.shape[1]], i4).tobytes())
    out.write(data[:frames].astype(f4).tobytes())
    payload = out.getvalue()
    if hasattr(f, "write"):
        f.write(payload)
    else:
        with open(f, "wb") as fh:
            fh.write(payload)


def write_features_text(data: np.ndarray, f: PathOrFile) -> None:
    """Plain text dump: one frame per line, space-separated floats.

    Mirrors BatchData::dumpToFile text mode (/root/reference/src/cpp/
    float_dnn.cc:128-164).
    """
    lines = "\n".join(" ".join(repr(float(v)) for v in row) for row in np.asarray(data))
    if hasattr(f, "write"):
        f.write(lines)  # text-mode file objects (sys.stdout, StringIO)
    else:
        with open(f, "w") as fh:
            fh.write(lines)
