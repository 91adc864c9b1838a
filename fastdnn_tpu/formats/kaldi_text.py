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

# C strtof token syntax (decimal / hex / inf / nan), longest-prefix greedy —
# the native parser tokenizes rows with strtof (fastdnn_io.cc:293-298), so
# the Python fallback must split identically ("1.5-2" is TWO values to
# strtof, not a bad token; "0x10" is 16.0).
_CFLOAT = re.compile(
    r"""[+-]?(?:
        0[xX](?:[0-9a-fA-F]+(?:\.[0-9a-fA-F]*)?|\.[0-9a-fA-F]+)(?:[pP][+-]?[0-9]+)?
      | (?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?
      | [iI][nN][fF](?:[iI][nN][iI][tT][yY])?
      | [nN][aA][nN]
    )""",
    re.VERBOSE,
)


def _parse_row_strtof(line: str) -> np.ndarray:
    """One feature row tokenized exactly like the native strtof loop."""
    vals: List[float] = []
    pos, n = 0, len(line)
    while pos < n:
        if line[pos] in " \t\r":
            pos += 1
            continue
        m = _CFLOAT.match(line, pos)
        if m is None:
            raise ValueError(f"bad float at column {pos}: {line[pos:pos+12]!r}")
        tok = m.group(0)
        vals.append(float.fromhex(tok) if "x" in tok or "X" in tok else float(tok))
        pos = m.end()
    return np.array(vals, dtype=np.float32)


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
    """Parse a Kaldi text feature file -> {utterance_id: [frames, dim]}.

    Single-pass tokenizer with POSITIONAL id/block pairing, mirroring the
    strict native parser (native/fastdnn_io.cc fd_read_features_text) so
    malformed files either parse identically in both or fail loudly in
    both.  (The reference's own Java parser zips two independent regex
    scans over the whole file, BatchData.java:140-160, which can silently
    mispair ids and blocks on malformed input — a laxness this parser
    deliberately does not reproduce.)

    Native-parity semantics:
      * the utterance id is the FIRST whitespace token before each `[`;
        any extra tokens between id and `[` are ignored;
      * rows are tokenized with C strtof rules (_parse_row_strtof) and end
        at newlines; '\r' is row-internal whitespace;
      * end-of-file closes an open block like `]` does;
      * ragged rows, non-numeric garbage, or an empty block raise
        ValueError (the native parser rejects the file);
      * trailing text after the last block (an id without a block) is
        ignored, as the native parser does;
      * a file with no complete utterance raises ValueError.
    """
    result: Dict[str, np.ndarray] = {}
    pos = 0
    while True:
        lb = text.find("[", pos)
        if lb == -1:
            break  # trailing id-without-block is dropped, like native
        head = text[pos:lb].split()
        utt_id = head[0] if head else ""
        rb = text.find("]", lb + 1)
        nxt = text.find("[", lb + 1)
        if nxt != -1 and (rb == -1 or nxt < rb):
            # a second '[' inside the block: the strtof loop hits it and
            # rejects (fastdnn_io.cc:295-296)
            raise ValueError(
                f"'[' inside feature block for utterance {utt_id!r}"
            )
        inner = text[lb + 1 : rb] if rb != -1 else text[lb + 1 :]
        if rb == -1:
            # EOF inside a block: the native loop exits WITHOUT committing a
            # row in progress, so trailing tokens after the last newline
            # make the frame count inconsistent and the file is rejected
            # (fastdnn_io.cc:300-304; test_text_parser_truncated_mid_number).
            # A newline-terminated final row is committed and accepted.
            tail = inner[inner.rfind("\n") + 1 :]
            if tail.strip(" \t\r"):
                raise ValueError(
                    f"file truncated mid-row in utterance {utt_id!r}"
                )
        rows = []
        dim = -1
        for ln, line in enumerate(inner.split("\n")):
            if not line.strip():
                continue
            try:
                vals = _parse_row_strtof(line)
            except ValueError as e:
                raise ValueError(
                    f"utterance {utt_id!r}, row {ln}: {e}"
                ) from None
            if dim == -1:
                dim = vals.shape[0]
            elif vals.shape[0] != dim:
                raise ValueError(
                    f"ragged rows in utterance {utt_id!r}: row {ln} has "
                    f"{vals.shape[0]} values, expected {dim}"
                )
            rows.append(vals)
        if not rows:
            raise ValueError(f"empty feature block for utterance {utt_id!r}")
        result[utt_id] = np.stack(rows)
        if rb == -1:
            break  # EOF closed the block (native treats EOF like ']')
        pos = rb + 1
    if not result:
        raise ValueError("no complete utterance blocks found")
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
