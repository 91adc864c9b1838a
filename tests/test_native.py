"""Native C++ IO library tests: build it, then check byte-level parity with
the pure-numpy readers on the bundled reference data and random roundtrips."""

import io
import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def native():
    from fastdnn_tpu.formats import native as nat

    if os.environ.get("FASTDNN_NATIVE", "1") == "0":
        pytest.skip("native IO disabled via FASTDNN_NATIVE=0")
    if not nat.available():
        if shutil.which("g++") is None or shutil.which("make") is None:
            pytest.skip("no native toolchain")
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
        nat._lib = None  # force re-probe
        assert nat.available()
    return nat


def _numpy_read_features(path):
    from fastdnn_tpu.formats.binary import _Reader

    r = _Reader(open(path, "rb").read())
    n, d = r.read_i32(), r.read_i32()
    return r.read_f32_array(n * d).reshape(n, d)


class TestNativeIO:
    def test_features_parity_with_numpy(self, native):
        for f in ["16khz.bin", "8khz.aligned.bin"]:
            p = os.path.join(DATA, f)
            np.testing.assert_array_equal(native.read_features(p), _numpy_read_features(p))

    def test_model_roundtrip(self, native, tmp_path, rng):
        from fastdnn_tpu.formats import binary

        layers = [
            binary.RawLayer(
                rng.standard_normal((8, 6)).astype(np.float32),
                rng.standard_normal(8).astype(np.float32),
            ),
            binary.RawLayer(
                rng.standard_normal((4, 8)).astype(np.float32),
                rng.standard_normal(4).astype(np.float32),
            ),
        ]
        net = binary.RawNetwork(
            layers,
            rng.standard_normal(6).astype(np.float32),
            rng.standard_normal(6).astype(np.float32),
        )
        p = tmp_path / "m.bin"
        buf = io.BytesIO()
        binary.write_model(net, buf)
        p.write_bytes(buf.getvalue())
        out = native.read_model(p)
        for a, b in zip(net.layers, out.layers):
            np.testing.assert_array_equal(a.weights, b.weights)
            np.testing.assert_array_equal(a.bias, b.bias)
        np.testing.assert_array_equal(net.shift, out.shift)
        np.testing.assert_array_equal(net.scale, out.scale)

    def test_feature_write_read(self, native, tmp_path, rng):
        data = rng.standard_normal((37, 12)).astype(np.float32)
        p = tmp_path / "f.bin"
        native.write_features(data, p)
        np.testing.assert_array_equal(native.read_features(p), data)
        # and numpy can read what native wrote (same format)
        np.testing.assert_array_equal(_numpy_read_features(p), data)

    def test_corrupt_files_rejected(self, native, tmp_path):
        bad = tmp_path / "bad.bin"
        bad.write_bytes(b"\x00\x00")
        with pytest.raises(ValueError):
            native.read_features(bad)
        with pytest.raises(ValueError):
            native.read_model(bad)

    def test_dispatch_through_binary_module(self, native):
        """formats.binary transparently uses the native reader for paths."""
        from fastdnn_tpu.formats.binary import read_features

        a = read_features(os.path.join(DATA, "16khz.bin"))
        assert a.shape == (100, 432)


class TestNativeTextFeatures:
    """fd_read_features_text: Kaldi text features parsed natively
    (BatchData.loadMultipleFromText analog, BatchData.java:145-183)."""

    def test_matches_python_parser_on_bundled_data(self, native):
        from fastdnn_tpu.formats import kaldi_text

        for name in ("16khz", "8khz"):
            path = os.path.join(DATA, name)
            got = native.read_features_text(path)
            with open(path) as f:
                ref = kaldi_text.parse_features_text(f.read())
            assert list(got) == list(ref)
            for k in got:
                np.testing.assert_array_equal(got[k], ref[k].astype(np.float32))

    def test_multiple_utterances(self, native, tmp_path):
        p = tmp_path / "feats.txt"
        p.write_text(
            "utt-a  [\n  1.0 2.0 3.0\n  4 5 6 ]\n"
            "utt-b [\n  7.5 -8 9e-1\n  1 2 3\n  4 5 6 ]\n"
        )
        got = native.read_features_text(p)
        assert list(got) == ["utt-a", "utt-b"]
        np.testing.assert_allclose(got["utt-a"], [[1, 2, 3], [4, 5, 6]])
        np.testing.assert_allclose(got["utt-b"], [[7.5, -8, 0.9], [1, 2, 3], [4, 5, 6]])

    def test_ragged_rows_rejected(self, native, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("u [\n 1 2 3\n 4 5 ]\n")
        with pytest.raises(ValueError):
            native.read_features_text(p)

    def test_dispatch_through_kaldi_text_module(self, native):
        from fastdnn_tpu.formats.kaldi_text import load_features_text

        feats = load_features_text(os.path.join(DATA, "16khz"))
        assert next(iter(feats.values())).shape == (193, 429)


DATA_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestNativeCli:
    """The native fastdnn-io executable (make -C native) — the host-side
    analog of the reference's native CLI (dnn.cc:20-84)."""

    @pytest.fixture(scope="class")
    def cli(self):
        import subprocess

        path = os.path.join(DATA_REPO, "native", "fastdnn-io")
        if not os.path.exists(path):
            r = subprocess.run(["make", "-C", os.path.join(DATA_REPO, "native")],
                               capture_output=True)
            if r.returncode != 0 or not os.path.exists(path):
                pytest.skip("native CLI not built")
        return path

    def test_info_and_finfo(self, cli):
        import subprocess

        golden = os.path.join(DATA_REPO, "tests", "golden", "parity_model.bin")
        out = subprocess.run([cli, "info", golden], capture_output=True, text=True)
        assert out.returncode == 0
        assert "topology= 432-64-64-64-100" in out.stdout
        out = subprocess.run([cli, "finfo", os.path.join(DATA, "8khz.aligned.bin")],
                             capture_output=True, text=True)
        assert "frames = 389" in out.stdout and "dim    = 432" in out.stdout

    def test_text2bin_matches_python(self, cli, tmp_path):
        import subprocess

        from fastdnn_tpu.formats.binary import read_features
        from fastdnn_tpu.formats.kaldi_text import first_utterance

        out_bin = tmp_path / "16khz.bin"
        r = subprocess.run([cli, "text2bin", os.path.join(DATA, "16khz"), str(out_bin)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        got = read_features(out_bin)
        ref = first_utterance(os.path.join(DATA, "16khz")).astype(np.float32)
        np.testing.assert_array_equal(got, ref)

    def test_bad_usage(self, cli):
        import subprocess

        r = subprocess.run([cli], capture_output=True, text=True)
        assert r.returncode == 1 and "usage" in r.stderr
        r = subprocess.run([cli, "info", "/nonexistent"], capture_output=True, text=True)
        assert r.returncode == 2 and "error" in r.stderr


def test_text_parser_truncated_mid_number(native, tmp_path):
    """A file ending mid-number (no ], no newline) must fail cleanly — the
    parser buffer is NUL-terminated so strtof cannot scan off the end."""
    p = tmp_path / "trunc.txt"
    p.write_bytes(b"u [\n 1.0 2.5")
    with pytest.raises(ValueError):
        native.read_features_text(p)
