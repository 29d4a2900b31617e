"""TFRecord writer tests: roundtrip with our reader AND with TensorFlow's."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from iv2019_tpu.input.tfrecord import parse_example, read_tfrecords
from iv2019_tpu.input.tfrecord_writer import (
    TFRecordWriter,
    crc32c,
    encode_example,
    masked_crc32c,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_sharded_read_glob_and_list(tmp_path):
    """read_tfrecords accepts glob patterns and comma lists; shards stream
    in sorted order (production sharded-dataset layout)."""
    payloads = {}
    for shard in range(3):
        path = str(tmp_path / f"train-{shard:05d}-of-00003.tfrecord")
        with TFRecordWriter(path) as w:
            for i in range(2):
                rec = encode_example({"id": [shard * 10 + i]})
                w.write(rec)
        payloads[shard] = path

    def ids(records):
        return [parse_example(r)["id"][0] for r in records]

    got = ids(read_tfrecords(str(tmp_path / "train-*.tfrecord")))
    assert got == [0, 1, 10, 11, 20, 21]  # sorted shard order
    got = ids(read_tfrecords(f"{payloads[2]}, {payloads[0]}"))
    assert got == [20, 21, 0, 1]  # explicit list keeps given order
    with pytest.raises(FileNotFoundError, match="no TFRecord files"):
        next(read_tfrecords(str(tmp_path / "missing-*.tfrecord")))


def test_roundtrip_own_reader(tmp_path):
    path = str(tmp_path / "own.tfrecords")
    with TFRecordWriter(path) as w:
        for i in range(3):
            w.write(encode_example({
                "image/encoded": bytes([i] * 10),
                "image/format": "png",
                "image/shape": [4, 5, 3],
                "floats": [0.25, -1.5],
            }))
    records = list(read_tfrecords(path))
    assert len(records) == 3
    ex = parse_example(records[1])
    assert ex["image/encoded"][0] == bytes([1] * 10)
    assert ex["image/format"][0] == b"png"
    assert ex["image/shape"] == [4, 5, 3]
    np.testing.assert_allclose(ex["floats"], [0.25, -1.5])


def test_tensorflow_can_read_our_records(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tf.tfrecords")
    with TFRecordWriter(path) as w:
        w.write(encode_example({
            "image/encoded": b"\x01\x02\x03",
            "image/shape": [2, 3, 1],
            "image/path": "a/b.png",
        }))
    ds = tf.data.TFRecordDataset(path)
    raw = next(iter(ds)).numpy()
    ex = tf.train.Example()
    ex.ParseFromString(raw)
    f = ex.features.feature
    assert f["image/encoded"].bytes_list.value[0] == b"\x01\x02\x03"
    assert list(f["image/shape"].int64_list.value) == [2, 3, 1]
    assert f["image/path"].bytes_list.value[0] == b"a/b.png"


def test_make_tfrecords_cityscapes_layout(tmp_path):
    from iv2019_tpu.tools.make_tfrecords import cityscapes_pairs, write_pairs

    root = tmp_path / "cs"
    img_dir = root / "leftImg8bit" / "val" / "city1"
    lab_dir = root / "gtFine" / "val" / "city1"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (8, 16, 3), np.uint8)
        ).save(img_dir / f"im{i}_leftImg8bit.png")
        Image.fromarray(
            rng.randint(0, 33, (8, 16), np.uint8)
        ).save(lab_dir / f"im{i}_gtFine_labelIds.png")

    pairs = list(cityscapes_pairs(str(root), "val"))
    assert len(pairs) == 2
    out = str(tmp_path / "out.tfrecords")
    assert write_pairs(pairs, out) == 2

    # readable by the training pipeline's parser
    ex = parse_example(next(read_tfrecords(out)))
    img = np.asarray(Image.open(io.BytesIO(ex["image/encoded"][0])))
    assert img.shape == (8, 16, 3)
    assert ex["label/shape"] == [8, 16, 1]
