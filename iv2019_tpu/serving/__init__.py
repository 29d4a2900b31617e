"""C++ PJRT serving runtime: build + drive the standalone StableHLO loader.

TPU-native counterpart of the reference's frozen-graph deployment story
(reference tools/pb2pbtxt.py, define_savers.py:68-69): the exported artifact
(iv2019_tpu/tools/export_model.py, ``forward.stablehlo.mlir``) is served by a
pure C++ binary (``pjrt_loader.cc``) that dlopens a PJRT plugin, compiles the
module, and executes it — no Python, TF, or JAX in the serving process.

``build()`` compiles the binary on demand with the system toolchain (cached
by source hash, like iv2019_tpu/native). ``serve()`` runs it and parses the
one-line JSON report.

Plugin discovery order: $PJRT_PLUGIN_PATH, the axon tunnel plugin
(/opt/axon/libaxon_pjrt.so), then libtpu bundled in site-packages. For the
axon plugin the client create-options mirror what the environment's JAX
registration passes (topology/session_id/remote_compile).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import uuid
from typing import Optional, Sequence

__all__ = ["build", "find_plugin", "default_options", "serve", "StreamServer"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pjrt_loader.cc")


def _tf_include_dir() -> Optional[str]:
    """The vendored XLA headers in the installed tensorflow wheel (no TF
    import — just the path)."""
    import sysconfig

    cand = os.path.join(sysconfig.get_paths()["purelib"], "tensorflow", "include")
    return cand if os.path.isdir(cand) else None


def build() -> Optional[str]:
    """Compile pjrt_loader.cc -> cached binary path (None if no toolchain)."""
    inc = _tf_include_dir()
    if inc is None or not os.path.exists(
        os.path.join(inc, "xla", "pjrt", "c", "pjrt_c_api.h")
    ):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    bin_path = os.path.join(_DIR, f"_pjrt_serve_{digest}")
    if os.path.exists(bin_path):
        return bin_path
    tmp = bin_path + ".tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-pthread", "-I", inc, "-o", tmp,
             _SRC, "-ldl"],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.replace(tmp, bin_path)
    return bin_path


def find_plugin() -> Optional[str]:
    cand = os.environ.get("PJRT_PLUGIN_PATH")
    if cand and os.path.exists(cand):
        return cand
    for cand in (
        "/opt/axon/libaxon_pjrt.so",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(_DIR))),
            "libtpu", "libtpu.so",
        ),
    ):
        if os.path.exists(cand):
            return cand
    return None


def default_options(plugin_path: str) -> list[str]:
    """key=value client create-options for the known plugins."""
    if "axon" in os.path.basename(plugin_path):
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        remote = os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1")
        return [
            f"topology={gen}:1x1x1",
            f"session_id={uuid.uuid4()}",
            f"remote_compile={remote}",
            "local_only=0",
            "priority=0",
            "n_slices=1",
            "rank=4294967295",
        ]
    return []


class StreamServer:
    """Persistent serving process: compile once, stream frames over pipes.

    Wraps ``pjrt_serve --stream``: the C++ process compiles the exported
    StableHLO once, then serves fixed-size f32 NHWC frames from stdin,
    answering each with output 0 (u64-LE size + raw bytes) on stdout.
    The first ``infer`` blocks until device compilation finishes;
    subsequent requests pay only execute + transfer. Diagnostics stream to
    ``stderr_path``.
    """

    def __init__(
        self,
        module_path: str,
        input_shape: Sequence[int],
        plugin_path: Optional[str] = None,
        options: Optional[Sequence[str]] = None,
        input_dtype: str = "float32",
    ):
        bin_path = build()
        if bin_path is None:
            raise RuntimeError("pjrt_serve binary unavailable")
        plugin_path = plugin_path or find_plugin()
        if plugin_path is None:
            raise RuntimeError("no PJRT plugin found (set PJRT_PLUGIN_PATH)")
        if options is None:
            options = default_options(plugin_path)
        import numpy as np

        if input_dtype not in ("float32", "uint8"):
            raise ValueError("input_dtype must be 'float32' or 'uint8'")
        self.input_dtype = np.dtype(input_dtype)
        self.input_shape = tuple(int(d) for d in input_shape)
        shape_arg = ",".join(str(d) for d in self.input_shape)
        if input_dtype == "uint8":
            # 4x less pipe + host<->device traffic; module must be exported
            # with export_model wire_u8=True
            shape_arg += ":u8"
        self.stderr_path = os.path.join(
            os.path.dirname(module_path), "pjrt_serve.stderr"
        )
        self._stderr = open(self.stderr_path, "wb")
        self._proc = subprocess.Popen(
            [
                bin_path, plugin_path, module_path, shape_arg, "--stream",
                *options,
            ],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=self._stderr,
        )

    def _send(self, frame) -> None:
        import numpy as np

        arr = np.ascontiguousarray(frame, dtype=self.input_dtype)
        if arr.shape != self.input_shape:
            raise ValueError(f"frame shape {arr.shape} != {self.input_shape}")
        self._proc.stdin.write(arr.tobytes())
        self._proc.stdin.flush()

    def _recv(self) -> bytes:
        header = self._proc.stdout.read(8)
        if len(header) != 8:
            raise RuntimeError(
                f"server died (see {self.stderr_path}); rc={self._proc.poll()}"
            )
        size = int.from_bytes(header, "little")
        out = self._proc.stdout.read(size)
        if len(out) != size:
            raise RuntimeError("short response from server")
        return out

    def infer(self, frame) -> bytes:
        """Send one NHWC frame; returns output 0's raw bytes."""
        self._send(frame)
        return self._recv()

    def infer_many(self, frames) -> list:
        """Pipelined batch of requests: a writer thread streams all frames
        while this thread collects responses in order — with the server's
        reader-thread double buffer, sustained rate is execute-bound.
        Returns the list of output-0 byte strings.
        """
        import threading

        frames = list(frames)
        err: list = []

        def _writer():
            try:
                for f in frames:
                    self._send(f)
            except Exception as e:  # surfaced after the reads drain/fail
                err.append(e)

        t = threading.Thread(target=_writer, daemon=True)
        t.start()
        try:
            outs = [self._recv() for _ in frames]
        finally:
            t.join()
        if err:
            raise err[0]
        return outs

    def close(self) -> None:
        # close stdin even if the child already exited — otherwise the
        # pipe fd leaks across repeated server restarts
        if self._proc.stdin and not self._proc.stdin.closed:
            self._proc.stdin.close()
        if self._proc.poll() is None:
            try:
                self._proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                self._proc.kill()
        self._stderr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def serve(
    module_path: str,
    input_shape: Sequence[int],
    iters: int = 10,
    plugin_path: Optional[str] = None,
    options: Optional[Sequence[str]] = None,
    timeout: float = 900.0,
    input_dtype: str = "float32",
) -> dict:
    """Run the C++ loader on a StableHLO module; returns the parsed report.

    ``input_dtype='uint8'`` matches a module exported with
    export_model ``wire_u8=True`` (same ``:u8`` shape suffix StreamServer
    uses); feeding an f32 spec to a u8-signature module fails the
    loader's argument check at warmup."""
    bin_path = build()
    if bin_path is None:
        raise RuntimeError("pjrt_serve binary unavailable (no toolchain/headers)")
    plugin_path = plugin_path or find_plugin()
    if plugin_path is None:
        raise RuntimeError("no PJRT plugin found (set PJRT_PLUGIN_PATH)")
    if options is None:
        options = default_options(plugin_path)
    if input_dtype not in ("float32", "uint8"):
        raise ValueError("input_dtype must be 'float32' or 'uint8'")
    shape_arg = ",".join(str(int(d)) for d in input_shape)
    if input_dtype == "uint8":
        shape_arg += ":u8"
    cmd = [
        bin_path, plugin_path, module_path, shape_arg, str(iters), *options,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"pjrt_serve failed rc={proc.returncode}:\n{proc.stderr[-2000:]}"
        )
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    out["stderr"] = proc.stderr[-2000:]
    return out
