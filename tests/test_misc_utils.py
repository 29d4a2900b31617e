"""Coverage for small utilities: zip snapshot, prefetcher, metrics printer."""

import os
import zipfile

import numpy as np
import pytest

from iv2019_tpu.input.prefetch import device_prefetch
from iv2019_tpu.parallel.mesh import create_mesh
from iv2019_tpu.utils.metrics import print_metrics_from_confusion_matrix
from iv2019_tpu.utils.util_zip import zipit


def test_zipit(tmp_path):
    src = tmp_path / "code"
    (src / "pkg").mkdir(parents=True)
    (src / "a.py").write_text("x = 1\n")
    (src / "pkg" / "b.py").write_text("y = 2\n")
    (src / "notes.txt").write_text("not python")
    out = str(tmp_path / "all_code.zip")
    n = zipit(str(src), out)
    assert n == 2
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
    assert names == {"a.py", os.path.join("pkg", "b.py")}


class TestDevicePrefetch:
    def test_passthrough_order_and_types(self):
        mesh = create_mesh()
        batches = [
            {"x": np.full((8, 2), i, np.float32), "meta": [f"s{i}"]}
            for i in range(4)
        ]
        out = list(device_prefetch(iter(batches), mesh))
        assert len(out) == 4
        for i, b in enumerate(out):
            assert float(np.asarray(b["x"])[0, 0]) == i
            assert b["meta"] == [f"s{i}"]  # non-arrays stay host-side

    def test_producer_exception_propagates(self):
        mesh = create_mesh()

        def bad():
            yield {"x": np.zeros((8,), np.float32)}
            raise RuntimeError("pipeline broke")

        it = device_prefetch(bad(), mesh)
        next(it)
        with pytest.raises(RuntimeError, match="pipeline broke"):
            list(it)

    def test_indivisible_batch_replicated(self):
        mesh = create_mesh()
        out = list(device_prefetch(iter([{"x": np.zeros((3, 2), np.float32)}]), mesh))
        assert np.asarray(out[0]["x"]).shape == (3, 2)


def test_metrics_printer_report_format(tmp_path, capsys):
    cm = np.array([[5, 1], [2, 8]], np.int64)
    m = print_metrics_from_confusion_matrix(cm, ["road", "car"], printcmd=True)
    captured = capsys.readouterr().out
    assert "Global accuracy" in captured
    assert "road" in captured and "car" in captured
    assert "Mean iou" in captured
    assert 0 <= m["mean_iou"] <= 100
    # file summary mode
    with open(tmp_path / "out.txt", "w") as f:
        print_metrics_from_confusion_matrix(cm, ["road", "car"], printfile=f, summary=True)
    text = (tmp_path / "out.txt").read_text()
    assert "Mean accuracy" in text


class TestBootstrappingFlag:
    """--bootstrapping_percentage is functional here (bootstrapped CE,
    losses/hierarchical.bootstrap_weights) though the reference never
    consumes it (registered at utils/utils.py:114); out-of-range values
    must be rejected and the default must stay silent."""

    def test_out_of_range_rejected(self):
        from iv2019_tpu.config import Settings

        with pytest.raises(ValueError, match="bootstrapping_percentage"):
            Settings(bootstrapping_percentage=-5).finalize().validate()

    def test_default_does_not_warn(self):
        import warnings as _w

        from iv2019_tpu.config import Settings

        with _w.catch_warnings():
            _w.simplefilter("error", UserWarning)
            Settings().finalize().validate()
