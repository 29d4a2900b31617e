"""Native TensorBoard event writer vs TensorBoard's own reader.

The oracle is ``tensorboard.backend.event_processing.event_accumulator`` —
the exact code ``tensorboard`` uses to load event files — so a CRC framing
or protobuf encoding mistake fails the roundtrip, not just our own parser.
Reference capability: TF summaries at define_estimator_hierarchical.py:290-398.
"""

import io
import os

import numpy as np
import pytest

from iv2019_tpu.utils.tb_writer import EventFileWriter, _crc32c, masked_crc32c

ea = pytest.importorskip("tensorboard.backend.event_processing.event_accumulator")


def test_crc32c_known_vector():
    # RFC 3720 B.4 test vector
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    # masking must stay in uint32 range
    assert 0 <= masked_crc32c(b"123456789") <= 0xFFFFFFFF


def _load(log_dir):
    acc = ea.EventAccumulator(
        log_dir, size_guidance={"scalars": 0, "images": 0}
    )
    acc.Reload()
    return acc


def test_scalar_roundtrip(tmp_path):
    d = str(tmp_path)
    w = EventFileWriter(d)
    for step in range(5):
        w.add_scalar("loss/total", 3.25 - 0.5 * step, step)
        w.add_scalar("learning_rate", 0.01, step)
    w.close()

    acc = _load(d)
    assert set(acc.Tags()["scalars"]) == {"loss/total", "learning_rate"}
    events = acc.Scalars("loss/total")
    assert [e.step for e in events] == list(range(5))
    np.testing.assert_allclose(
        [e.value for e in events], [3.25 - 0.5 * s for s in range(5)], rtol=1e-6
    )


def test_image_roundtrip(tmp_path):
    from PIL import Image

    d = str(tmp_path)
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (32, 48, 3), np.uint8)
    gray = rng.randint(0, 255, (16, 24), np.uint8)
    w = EventFileWriter(d)
    w.add_image("decisions", rgb, 7)
    w.add_image("debug/l1_weights", gray, 7)
    w.close()

    acc = _load(d)
    assert set(acc.Tags()["images"]) == {"decisions", "debug/l1_weights"}
    ev = acc.Images("decisions")[0]
    assert (ev.step, ev.height, ev.width) == (7, 32, 48)
    decoded = np.asarray(Image.open(io.BytesIO(ev.encoded_image_string)))
    np.testing.assert_array_equal(decoded, rgb)
    ev_g = acc.Images("debug/l1_weights")[0]
    decoded_g = np.asarray(Image.open(io.BytesIO(ev_g.encoded_image_string)))
    np.testing.assert_array_equal(decoded_g, gray)


def test_chw_and_float_inputs(tmp_path):
    d = str(tmp_path)
    w = EventFileWriter(d)
    chw = np.zeros((3, 8, 9), np.uint8)
    w.add_image("chw", chw, 0, dataformats="CHW")
    w.add_image("float", np.full((4, 4), 300.0), 0)  # clipped to 255
    w.close()
    acc = _load(d)
    ev = acc.Images("chw")[0]
    assert (ev.height, ev.width) == (8, 9)


def test_metrics_logger_writes_native_events(tmp_path):
    """MetricsLogger must produce TB events with no torch import."""
    from iv2019_tpu.train.loop import MetricsLogger

    d = str(tmp_path)
    logger = MetricsLogger(d)
    logger.log(10, {"total": 1.5, "l1_segmentation": 0.5})
    logger.log_images(10, {"decisions": np.zeros((4, 4, 3), np.uint8)})
    logger.close()

    # JSONL side
    with open(os.path.join(d, "train_metrics.jsonl")) as f:
        rec = f.readlines()[-1]
    assert '"total": 1.5' in rec
    # TB side, via TensorBoard's reader
    acc = _load(os.path.join(d, "tb"))
    assert acc.Scalars("total")[0].value == 1.5
    assert acc.Images("decisions")[0].step == 10
