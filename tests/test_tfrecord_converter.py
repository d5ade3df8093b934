"""TFRecord migration converters: the reference's on-disk datasets ingest
into this framework's shard formats (reference ilsvrc12_dataset.py:39-73,
pascalvoc_dataset.py:39-65 schemas)."""

import io
import os

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from pocketflow_tpu.config import FLAGS  # noqa: E402


def _jpeg_bytes(rng, h, w):
    from PIL import Image
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='JPEG', quality=95)
    return buf.getvalue()


def _bytes_feature(v):
    return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))


def _int64_feature(v):
    return tf.train.Feature(int64_list=tf.train.Int64List(
        value=v if isinstance(v, (list, tuple)) else [v]))


def _float_feature(v):
    return tf.train.Feature(float_list=tf.train.FloatList(value=list(v)))


def test_convert_ilsvrc12_tfrecords(tmp_path):
    from pocketflow_tpu.datasets.ilsvrc12 import Ilsvrc12Dataset
    from pocketflow_tpu.tools import convert_tfrecord as cv
    rng = np.random.default_rng(0)
    rec_path = str(tmp_path / 'train-00000-of-00001')
    with tf.io.TFRecordWriter(rec_path) as writer:
        for label in (1, 2, 3):
            example = tf.train.Example(features=tf.train.Features(feature={
                'image/encoded': _bytes_feature(_jpeg_bytes(rng, 90, 120)),
                'image/class/label': _int64_feature(label),
            }))
            writer.write(example.SerializeToString())
    out = str(tmp_path / 'npy')
    total = cv.convert_ilsvrc12_tfrecords(rec_path, out, 'train',
                                          resize=64, shard_size=2)
    assert total == 3
    names = sorted(os.listdir(out))
    assert names == ['train_extents_00000.npy', 'train_extents_00001.npy',
                     'train_images_00000.npy', 'train_images_00001.npy',
                     'train_labels_00000.npy', 'train_labels_00001.npy']
    # full-frame storage: each sample records its valid (h, w) extent inside
    # the fixed padded container (3dfb819 - Inception-preprocessing crop space)
    extents = np.concatenate([np.load(os.path.join(out, n))
                              for n in names if 'extents' in n])
    assert extents.shape == (3, 2)
    imgs0 = np.load(os.path.join(out, 'train_images_00000.npy'))
    assert (extents <= imgs0.shape[1:3]).all() and (extents > 0).all()
    with FLAGS.scope(data_dir_local=out, synthetic_data=False,
                     nb_smpls_train=3, batch_size=2):
        ds = Ilsvrc12Dataset(is_train=True)
        images, labels = ds._load_arrays()
    assert images.dtype == np.uint8 and images.shape[0] == 3
    labels = np.asarray(labels)
    if labels.ndim == 2:  # full-frame storage rides extents in labels[:, 1:3]
        labels = labels[:, 0]
    np.testing.assert_array_equal(np.sort(labels.astype(np.int64).ravel()),
                                  [1, 2, 3])


def test_convert_pascalvoc_tfrecords(tmp_path):
    from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset
    from pocketflow_tpu.tools import convert_tfrecord as cv
    rng = np.random.default_rng(1)
    rec_path = str(tmp_path / 'voc-00000')
    boxes = [  # two objects: class 12 (dog), class 7 (car)
        dict(label=12, ymin=0.1, xmin=0.2, ymax=0.5, xmax=0.6, difficult=1),
        dict(label=7, ymin=0.3, xmin=0.1, ymax=0.9, xmax=0.7, difficult=0)]
    with tf.io.TFRecordWriter(rec_path) as writer:
        example = tf.train.Example(features=tf.train.Features(feature={
            'image/encoded': _bytes_feature(_jpeg_bytes(rng, 90, 120)),
            'image/object/bbox/xmin': _float_feature(
                [b['xmin'] for b in boxes]),
            'image/object/bbox/ymin': _float_feature(
                [b['ymin'] for b in boxes]),
            'image/object/bbox/xmax': _float_feature(
                [b['xmax'] for b in boxes]),
            'image/object/bbox/ymax': _float_feature(
                [b['ymax'] for b in boxes]),
            'image/object/bbox/label': _int64_feature(
                [b['label'] for b in boxes]),
            'image/object/bbox/difficult': _int64_feature(
                [b['difficult'] for b in boxes]),
        }))
        writer.write(example.SerializeToString())
    out = str(tmp_path / 'npz')
    total = cv.convert_pascalvoc_tfrecords(rec_path, out, 'train',
                                           image_size=96)
    assert total == 1
    with FLAGS.scope(data_dir_local=out, synthetic_data=False,
                     voc_image_size=96, batch_size=1, nb_smpls_train=1):
        ds = PascalVocDataset(is_train=True)
        images, labels = ds._load_arrays()
    assert images.shape == (1, 96, 96, 3)
    # [class, ymin, xmin, ymax, xmax, validity]; difficult -> validity -1
    assert labels[0, 0, 0] == 12 and labels[0, 1, 0] == 7
    np.testing.assert_allclose(labels[0, 0, 1:5], [0.1, 0.2, 0.5, 0.6],
                               atol=1e-6)
    assert labels[0, 0, 5] == -1.0 and labels[0, 1, 5] == 1.0
