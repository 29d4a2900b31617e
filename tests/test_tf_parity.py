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


class TestConvPaddingParity:
    """Validate slim conv2d_same / SAME-pool padding against TF kernels."""

    def test_conv2d_same_stride2_kernel7(self):
        # resnet root conv: explicit (3,3) pad + VALID stride 2
        import jax
        import jax.numpy as jnp

        from iv2019_tpu.models.layers import ConvSame

        rng = np.random.RandomState(0)
        x = rng.rand(1, 17, 23, 3).astype(np.float32)
        k = rng.rand(7, 7, 3, 4).astype(np.float32) * 0.1

        pad = tf.pad(tf.constant(x), [[0, 0], [3, 3], [3, 3], [0, 0]])
        want = tf.nn.conv2d(pad, tf.constant(k), strides=2, padding="VALID").numpy()

        conv = ConvSame(4, 7, 2, dtype=jnp.float32)
        variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = jax.tree_util.tree_map(np.asarray, variables)
        variables["params"]["conv"]["kernel"] = k
        got = np.asarray(conv.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_conv2d_same_dilated(self):
        import jax
        import jax.numpy as jnp

        from iv2019_tpu.models.layers import ConvSame

        rng = np.random.RandomState(1)
        x = rng.rand(1, 16, 16, 2).astype(np.float32)
        k = rng.rand(3, 3, 2, 2).astype(np.float32) * 0.1
        want = tf.nn.conv2d(
            tf.constant(x), tf.constant(k), strides=1, padding="SAME",
            dilations=2,
        ).numpy()
        conv = ConvSame(2, 3, 1, rate=2, dtype=jnp.float32)
        variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = jax.tree_util.tree_map(np.asarray, variables)
        variables["params"]["conv"]["kernel"] = k
        got = np.asarray(conv.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("hw", [(16, 16), (17, 23), (31, 14)])
    def test_max_pool_same(self, hw):
        import jax.numpy as jnp

        from iv2019_tpu.models.resnet import _max_pool_same

        rng = np.random.RandomState(2)
        x = rng.rand(2, *hw, 3).astype(np.float32)
        want = tf.nn.max_pool2d(
            tf.constant(x), ksize=3, strides=2, padding="SAME"
        ).numpy()
        got = np.asarray(_max_pool_same(jnp.asarray(x), 3, 2))
        np.testing.assert_allclose(got, want, rtol=1e-6)


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
