"""C++ PJRT serving loader: build + CLI contract (device run is manual).

The full on-device round trip (export StableHLO -> C++ process compiles and
executes it through the PJRT plugin) needs the real TPU and the single-client
constraint, so it lives in tools/serve_demo.py; here we pin what CI can pin:
the binary builds from source, parses its arguments, and fails loudly and
correctly on a missing/invalid plugin.
"""

import os
import subprocess

import pytest

from iv2019_tpu import serving


@pytest.fixture(scope="module")
def binary():
    path = serving.build()
    if path is None:
        pytest.skip("no C++ toolchain / PJRT headers")
    return path


def test_builds(binary):
    assert os.path.exists(binary) and os.access(binary, os.X_OK)


def test_usage_error(binary):
    proc = subprocess.run([binary], capture_output=True, text=True)
    assert proc.returncode == 2
    assert "usage:" in proc.stderr


def test_missing_plugin_fails_loudly(binary, tmp_path):
    mlir = tmp_path / "m.mlir"
    mlir.write_text("module {}")
    proc = subprocess.run(
        [binary, str(tmp_path / "nope.so"), str(mlir), "1,8,8,3", "1"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "dlopen failed" in proc.stderr


def test_bad_option_rejected(binary, tmp_path):
    mlir = tmp_path / "m.mlir"
    mlir.write_text("module {}")
    proc = subprocess.run(
        [binary, str(tmp_path / "nope.so"), str(mlir), "1,8,8,3", "1", "noequals"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "bad option" in proc.stderr


def test_default_options_axon(monkeypatch):
    opts = serving.default_options("/opt/axon/libaxon_pjrt.so")
    keys = {o.split("=")[0] for o in opts}
    assert {"topology", "session_id", "remote_compile"} <= keys


def test_serve_requires_plugin(tmp_path, monkeypatch):
    monkeypatch.setenv("PJRT_PLUGIN_PATH", str(tmp_path / "missing.so"))
    monkeypatch.setattr(serving, "find_plugin", lambda: None)
    mlir = tmp_path / "m.mlir"
    mlir.write_text("module {}")
    if serving.build() is None:
        pytest.skip("no toolchain")
    with pytest.raises(RuntimeError, match="no PJRT plugin"):
        serving.serve(str(mlir), (1, 8, 8, 3))


def test_bad_dtype_suffix_rejected(binary, tmp_path):
    mlir = tmp_path / "m.mlir"
    mlir.write_text("module {}")
    proc = subprocess.run(
        [binary, str(tmp_path / "nope.so"), str(mlir), "1,8,8,3:i64", "1"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "bad dtype suffix" in proc.stderr


def test_u8_suffix_parses(binary, tmp_path):
    # u8 shape parses; failure must be the missing plugin, not the shape
    mlir = tmp_path / "m.mlir"
    mlir.write_text("module {}")
    proc = subprocess.run(
        [binary, str(tmp_path / "nope.so"), str(mlir), "1,8,8,3:u8", "1"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "dlopen failed" in proc.stderr


def test_export_wire_u8_signature(tmp_path):
    """wire_u8 export: u8 input, u8 output0, on-device normalize."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iv2019_tpu.tools.export_model import export_stablehlo

    class _Tiny:
        def apply(self, variables, images):
            s = images.sum(axis=-1, keepdims=True)
            return {
                "decisions": (s[..., 0] > 0).astype(jnp.int32),
                "l1_probabilities": jnp.concatenate([s, 1 - s], -1),
            }

    paths = export_stablehlo(_Tiny(), {}, (1, 4, 4, 3), str(tmp_path), wire_u8=True)
    text = open(paths["stablehlo"]).read()
    assert "tensor<1x4x4x3xui8>" in text  # u8 input signature
    assert "tensor<1x4x4xui8>" in text  # u8 decisions output


def test_stream_server_rejects_bad_dtype(tmp_path):
    from iv2019_tpu.serving import StreamServer

    with pytest.raises((ValueError, RuntimeError)):
        StreamServer(str(tmp_path / "m.mlir"), (1, 4, 4, 3), input_dtype="int64")
