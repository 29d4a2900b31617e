"""Parity tests against TensorFlow as an independent oracle.

These lock in the TF1 semantics the reference depends on (SURVEY.md §7
'hard parts'): resize_images align_corners True/False for bilinear and NN,
and TFRecord/Example serialization. TF is a *test-only* dependency — the
framework never imports it at runtime.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from iv2019_tpu.input.tfrecord import parse_example, read_tfrecords
from iv2019_tpu.ops.resize import resize_bilinear, resize_nearest


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 12), (16, 24)), ((16, 24), (8, 12)), ((7, 13), (11, 5)), ((64, 128), (512, 1024))],
)
def test_bilinear_matches_tf1(align, in_hw, out_hw):
    rng = np.random.RandomState(0)
    img = rng.rand(2, *in_hw, 3).astype(np.float32)
    want = tf.compat.v1.image.resize_images(
        tf.constant(img), out_hw, method=tf.image.ResizeMethod.BILINEAR,
        align_corners=align,
    ).numpy()
    got = np.asarray(resize_bilinear(img, out_hw, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 12), (16, 24)), ((16, 24), (8, 12)), ((7, 13), (11, 5)), ((33, 65), (512, 1024))],
)
def test_nearest_matches_tf1(align, in_hw, out_hw):
    rng = np.random.RandomState(1)
    lbl = rng.randint(0, 20, size=(2, *in_hw, 1)).astype(np.int32)
    want = tf.compat.v1.image.resize_images(
        tf.constant(lbl), out_hw, method=tf.image.ResizeMethod.NEAREST_NEIGHBOR,
        align_corners=align,
    ).numpy()[..., 0]
    got = np.asarray(resize_nearest(lbl[..., 0], out_hw, align_corners=align))
    np.testing.assert_array_equal(got, want)


def test_tfrecord_example_roundtrip(tmp_path):
    """Write TFRecords with TF, read them with our dependency-free reader."""
    path = str(tmp_path / "test.tfrecords")
    rng = np.random.RandomState(2)
    records = []
    with tf.io.TFRecordWriter(path) as w:
        for i in range(3):
            img_bytes = rng.bytes(50 + i)
            feats = {
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[img_bytes])
                ),
                "image/format": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"png"])
                ),
                "image/shape": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[1024, 2048, 3])
                ),
                "image/path": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[f"img_{i}.png".encode()])
                ),
                "floats": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[0.5, 1.5, -2.0])
                ),
            }
            ex = tf.train.Example(features=tf.train.Features(feature=feats))
            w.write(ex.SerializeToString())
            records.append(img_bytes)

    got = list(read_tfrecords(path))
    assert len(got) == 3
    for i, rec in enumerate(got):
        parsed = parse_example(rec)
        assert parsed["image/encoded"][0] == records[i]
        assert parsed["image/format"][0] == b"png"
        assert parsed["image/shape"] == [1024, 2048, 3]
        assert parsed["image/path"][0].decode() == f"img_{i}.png"
        np.testing.assert_allclose(parsed["floats"], [0.5, 1.5, -2.0], rtol=1e-6)
