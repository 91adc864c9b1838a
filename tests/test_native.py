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
