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

import math
import re
from typing import Dict, List, Tuple

import numpy as np

from .binary import RawLayer, RawNetwork

_BRACKET_BLOCK = re.compile(r"\[(.+?)\]", re.DOTALL)

# The native parser tokenizes rows with C strtof (fastdnn_io.cc:293-298).
# For exact agreement — token syntax, the leading-isspace skip (which
# includes \v/\f and can even cross a \n they precede), nan(char-seq)
# payloads, and correctly-rounded decimal->f32 — the primary token reader
# IS libc strtof, bound via ctypes.  The regex below is the fallback for
# platforms without a dlopen-able libc; it accepts the same token grammar
# but parses via Python float (double), which can differ from strtof's
# direct single rounding by 1 ulp on adversarial decimals.
try:
    import ctypes

    _LIBC = ctypes.CDLL(None, use_errno=True)
    _C_STRTOF = _LIBC.strtof
    _C_STRTOF.restype = ctypes.c_float
    _C_STRTOF.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
except Exception:  # pragma: no cover - non-POSIX fallback
    _C_STRTOF = None

_CFLOAT = re.compile(
    r"""[+-]?(?:
        0[xX](?:[0-9a-fA-F]+(?:\.[0-9a-fA-F]*)?|\.[0-9a-fA-F]+)(?:[pP][+-]?[0-9]+)?
      | (?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?
      | [iI][nN][fF](?:[iI][nN][iI][tT][yY])?
      | [nN][aA][nN](?:\([0-9a-zA-Z_]*\))?
    )""",
    re.VERBOSE,
)
_STRTOF_WS = " \t\n\v\f\r"  # C isspace set strtof skips before a token


def _strtof_py(s: str, pos: int):
    """Pure-Python strtof: (value, end_pos); end_pos == pos -> no conversion."""
    p, n = pos, len(s)
    while p < n and s[p] in _STRTOF_WS:
        p += 1
    m = _CFLOAT.match(s, p)
    if m is None:
        return 0.0, pos
    tok = m.group(0)
    if "(" in tok:  # nan(char-seq): float() rejects the payload form (and
        # the payload may itself contain 'x'); keep the sign like strtof
        # does (-nan(..) has signbit set)
        v = math.copysign(math.nan, -1.0 if tok[0] == "-" else 1.0)
    elif "x" in tok or "X" in tok:
        v = float.fromhex(tok)
    else:
        v = float(tok)
    return v, m.end()


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

    Native-parity semantics (the row scan below is a statement-for-statement
    mirror of the native loop, fastdnn_io.cc:272-304, with tokens read by
    the SAME libc strtof via ctypes when available):
      * the utterance id is the FIRST whitespace token before each `[`;
        any extra tokens between id and `[` are ignored;
      * ' ', '\t', '\r' are row-internal whitespace; '\n' commits a row;
        strtof itself additionally skips any C isspace (including \v/\f —
        and even a \n THEY precede, splicing two physical lines into one
        row) before a token, and accepts inf/nan(char-seq)/hex tokens;
      * `]` or end-of-file closes the block, committing a row in progress —
        EXCEPT hard EOF immediately after a token, which leaves the row
        uncommitted and the file rejected (the native while-condition exit);
      * ragged rows, non-numeric garbage, or an empty block raise
        ValueError (the native parser rejects the file);
      * trailing text after the last block (an id without a block) is
        ignored, as the native parser does;
      * a file with no complete utterance raises ValueError.
    """
    result: Dict[str, np.ndarray] = {}
    n = len(text)
    token_at = None
    if _C_STRTOF is not None:
        try:
            data = text.encode("ascii")
        except UnicodeEncodeError:
            data = None  # non-ASCII bytes: offsets would diverge; use Python
        if data is not None:
            buf = ctypes.create_string_buffer(data)  # NUL-terminated, like
            base = ctypes.addressof(buf)  # the native fread buffer (:47)

            def token_at(p):
                endp = ctypes.c_void_p()
                v = _C_STRTOF(base + p, ctypes.byref(endp))
                return v, (endp.value or base) - base

    if token_at is None:
        def token_at(p):
            return _strtof_py(text, p)

    pos = 0
    while True:
        lb = text.find("[", pos)
        if lb == -1:
            break  # trailing id-without-block is dropped, like native
        head = text[pos:lb].split()
        utt_id = head[0] if head else ""

        vals: List[float] = []
        dim = 0
        frames = 0
        row_len = 0
        p = lb + 1
        while True:
            if p >= n:
                # hard EOF right after a token: the native while-condition
                # (:273) exits WITHOUT committing the row in progress; the
                # size check below then rejects the file
                break
            while p < n and text[p] in " \t\r":
                p += 1
            if p < n and text[p] == "\n":
                if row_len:
                    if dim == 0:
                        dim = row_len
                    elif row_len != dim:
                        raise ValueError(
                            f"ragged rows in utterance {utt_id!r}: row "
                            f"{frames} has {row_len} values, expected {dim}"
                        )
                    frames += 1
                    row_len = 0
                p += 1
                continue
            if p >= n or text[p] == "]":
                # ']' (or EOF reached through whitespace) commits a row in
                # progress, exactly like the native :284-291 branch
                if row_len:
                    if dim == 0:
                        dim = row_len
                    elif row_len != dim:
                        raise ValueError(
                            f"ragged rows in utterance {utt_id!r}: row "
                            f"{frames} has {row_len} values, expected {dim}"
                        )
                    frames += 1
                    row_len = 0
                if p < n:
                    p += 1  # past ']'
                break
            v, q = token_at(p)
            if q == p:
                # no conversion: garbage, a second '[', or whitespace
                # running into ']'/NUL — the native :295-296 rejection
                raise ValueError(
                    f"utterance {utt_id!r}: bad float at offset {p}: "
                    f"{text[p:p + 12]!r}"
                )
            vals.append(v)
            row_len += 1
            p = q

        if dim == 0 or frames == 0:
            raise ValueError(f"empty feature block for utterance {utt_id!r}")
        if len(vals) != frames * dim:
            raise ValueError(f"file truncated mid-row in utterance {utt_id!r}")
        result[utt_id] = np.array(vals, dtype=np.float32).reshape(frames, dim)
        pos = p
    if not result:
        raise ValueError("no complete utterance blocks found")
    return result


def load_features_text(path) -> Dict[str, np.ndarray]:
    try:
        from . import native

        if native.available():
            return native.read_features_text(path)
    except ValueError as e:
        # the Python parser mirrors the native one statement-for-statement,
        # so the retry should reject the same files with a clearer message;
        # log the native error so any residual divergence (the two parsers
        # are agreement-gated in tests/test_native.py) is visible, not
        # silently papered over
        import logging

        logging.getLogger(__name__).warning(
            "native text-feature parser rejected %s (%s); retrying with the "
            "mirroring Python parser",
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
