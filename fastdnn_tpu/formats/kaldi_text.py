"""Kaldi nnet1 text-format parsers.

Three text formats, matching what the reference's Java layer accepts:

1. Network file: a sequence of `<AffineTransform> <out> <in>` components, each
   followed by `out` rows of `in` weights and one bias row of `out` values;
   activation markers like `<Sigmoid>`/`<Softmax>` and bracket-only lines are
   skipped (/root/reference/src/java/suskun/nn/FeedForwardNetwork.java:159-207).

2. Feature-transform file: bracketed `[ ... ]` blocks; if three blocks are
   present the first is a `<Splice>` block and is dropped; the remaining two
   are the shift and scale vectors, which must match the network input dim
   (FeedForwardNetwork.java:86-119).  Each input frame is transformed as
   `(x + shift) * scale` before the first layer (README.md:20).

3. Feature file: `utterance-id [\n frame rows... ]` blocks
   (/root/reference/src/java/suskun/nn/BatchData.java:141-183).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from .binary import RawLayer, RawNetwork

_BRACKET_BLOCK = re.compile(r"\[(.+?)\]", re.DOTALL)
# utterance id = text preceding a bracket block
_UTT_ID = re.compile(r"(.+?)(?:\[.+?\])", re.DOTALL)


def _floats(text: str) -> np.ndarray:
    return np.array([float(t) for t in text.split()], dtype=np.float32)


def _next_line(lines):
    try:
        return next(lines)
    except StopIteration:
        raise ValueError("truncated network file: expected more weight/bias rows") from None


def parse_network_text(text: str) -> List[RawLayer]:
    """Parse nnet1 text into affine layers (weights [out, in], bias [out])."""
    layers: List[RawLayer] = []
    lines = iter(text.splitlines())
    node_count = -1
    input_count = -1
    for line in lines:
        line = line.strip()
        if not line:
            continue
        if line.startswith("<AffineTransform>"):
            rest = line[line.index(">") + 1 :].split()
            node_count, input_count = int(rest[0]), int(rest[1])
            continue
        if node_count == -1 or line.startswith("<") or line in ("[", "]"):
            continue
        # current line is the first weight row; read node_count rows of
        # weights then one bias row (the reference reads node_count+1 rows,
        # FeedForwardNetwork.java:186-201).
        weights = np.empty((node_count, input_count), dtype=np.float32)
        bias = np.empty(node_count, dtype=np.float32)
        row = line
        for i in range(node_count + 1):
            if i > 0:
                row = _next_line(lines)
            vals = _floats(row.replace("[", " ").replace("]", " "))
            if i < node_count:
                if vals.shape[0] != input_count:
                    raise ValueError(
                        f"weight row {i} has {vals.shape[0]} values, expected {input_count}"
                    )
                weights[i] = vals
            else:
                if vals.shape[0] != node_count:
                    raise ValueError(
                        f"bias row has {vals.shape[0]} values, expected {node_count}"
                    )
                bias = vals
        layers.append(RawLayer(weights, bias))
        node_count = -1
    return layers


def parse_transform_text(text: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a feature-transform file into (shift, scale) float32 vectors."""
    blocks = [m.group(1).strip() for m in _BRACKET_BLOCK.finditer(text.replace("\n", " "))]
    if len(blocks) == 3:  # leading <Splice> block is dropped
        blocks = blocks[1:]
    if len(blocks) != 2:
        raise ValueError(f"expected 2 transform blocks (shift, scale), got {len(blocks)}")
    return _floats(blocks[0]), _floats(blocks[1])


def load_network_text(network_path, transform_path) -> RawNetwork:
    """Parse network + transform text files into a RawNetwork.

    Validates shift/scale length against the network input dim like
    FeedForwardNetwork.loadFromTextFile (FeedForwardNetwork.java:109-117).
    """
    with open(network_path) as f:
        layers = parse_network_text(f.read())
    with open(transform_path) as f:
        shift, scale = parse_transform_text(f.read())
    input_dim = layers[0].input_dim
    if shift.shape[0] != input_dim:
        raise ValueError(
            f"shift vector size {shift.shape[0]} != network input dim {input_dim}"
        )
    if scale.shape[0] != input_dim:
        raise ValueError(
            f"scale vector size {scale.shape[0]} != network input dim {input_dim}"
        )
    return RawNetwork(layers, shift, scale)


def parse_features_text(text: str) -> Dict[str, np.ndarray]:
    """Parse a Kaldi text feature file -> {utterance_id: [frames, dim]}."""
    result: Dict[str, np.ndarray] = {}
    blocks = [m.group(1).strip() for m in _BRACKET_BLOCK.finditer(text)]
    ids = [m.group(1).strip() for m in _UTT_ID.finditer(text)]
    for utt_id, block in zip(ids, blocks):
        rows = [_floats(line) for line in block.splitlines() if line.strip()]
        result[utt_id] = np.stack(rows)
    return result


def load_features_text(path) -> Dict[str, np.ndarray]:
    try:
        from . import native

        if native.available():
            return native.read_features_text(path)
    except ValueError as e:
        # the native parser rejected a file the lax Python regex may still
        # read — log it so a parser-behavior divergence is visible, not
        # silently papered over (the two parsers are agreement-gated on
        # well-formed files in tests/test_native.py)
        import logging

        logging.getLogger(__name__).warning(
            "native text-feature parser rejected %s (%s); retrying with the "
            "tolerant Python parser",
            path,
            e,
        )
    except FileNotFoundError:
        raise
    except Exception as e:  # stale .so, symbol drift: degrade, don't crash
        import logging

        logging.getLogger(__name__).warning(
            "native text-feature parser unusable (%s: %s); using Python parser",
            type(e).__name__,
            e,
        )
    with open(path) as f:
        return parse_features_text(f.read())


def write_features_text_kaldi(feats: Dict[str, np.ndarray], f) -> None:
    """Write {utterance_id: [frames, dim]} in the Kaldi text feature format
    this module parses (utt-id [ rows ])."""

    def _emit(fh):
        for utt_id, mat in feats.items():
            fh.write(f"{utt_id}  [\n")
            rows = [" ".join(f"{v:.6f}" for v in row) for row in np.asarray(mat)]
            fh.write("\n".join("  " + r for r in rows))
            fh.write(" ]\n")

    if hasattr(f, "write"):
        _emit(f)
    else:
        with open(f, "w") as fh:
            _emit(fh)


def first_utterance(path) -> np.ndarray:
    """First utterance's frames, like BatchData.loadFromText
    (/root/reference/src/java/suskun/nn/BatchData.java:181-183)."""
    feats = load_features_text(path)
    return next(iter(feats.values()))
