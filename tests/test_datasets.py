"""Dataset + augmentation coverage: parsers, pipelines, on-device transforms."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def test_cifar10_bin_parse(tmp_path):
    """Real .bin files round-trip through the loader (native or numpy)."""
    from pocketflow_tpu.datasets.cifar10 import Cifar10Dataset, _parse_bin_files
    rng = np.random.default_rng(0)
    record = 1 + 3072
    raw = rng.integers(0, 256, size=(20 * record,), dtype=np.uint8)
    raw.reshape(-1, record)[:, 0] %= 10
    path = tmp_path / 'data_batch_1.bin'
    raw.tofile(path)
    images, labels = _parse_bin_files([str(path)])
    assert images.shape == (20, 32, 32, 3) and labels.shape == (20,)
    recs = raw.reshape(-1, record)
    np.testing.assert_array_equal(labels, recs[:, 0].astype(np.int32))
    expected = recs[:, 1:].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(images, expected)
    # dataset picks the files up through data_dir_local
    with FLAGS.scope(data_dir_local=str(tmp_path), batch_size=4,
                     nb_smpls_train=20, synthetic_data=False):
        ds = Cifar10Dataset(is_train=True)
        batch = next(ds.build())
        assert batch['image'].shape == (4, 32, 32, 3)


def test_pascalvoc_npz_parse(tmp_path):
    from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset
    images = np.zeros((6, 64, 64, 3), np.uint8)
    boxes = np.empty(6, object)
    for i in range(6):
        boxes[i] = np.asarray([[1 + i % 3, 0.1, 0.1, 0.5, 0.5]], np.float32)
    np.savez(tmp_path / 'train_000.npz', images=images, boxes=boxes)
    with FLAGS.scope(data_dir_local=str(tmp_path), voc_image_size=64,
                     nb_bboxs_max=4, batch_size=2, synthetic_data=False):
        ds = PascalVocDataset(is_train=True)
        batch = next(ds.build())
        assert batch['image'].shape == (2, 64, 64, 3)
        assert batch['label'].shape == (2, 4, 6)
        valid = batch['label'][:, :, 5]
        assert np.all(valid.sum(axis=1) == 1)  # one valid box per image


def test_synthetic_detection_difficulty_knobs():
    """The difficulty flags reshape the synthetic-VOC task (noise, texture
    amplitude, object size) while their DEFAULTS leave the generator
    bit-identical to the regime the committed SSD detection bands were
    measured in (experiments/results/detection_parity.json)."""
    from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset
    with FLAGS.scope(synthetic_data=True, voc_image_size=64, nb_bboxs_max=8,
                     nb_smpls_eval=48):
        ds = PascalVocDataset(is_train=False)
        img_a, lab_a = ds.synthesize_detection_arrays(48)
        img_b, lab_b = ds.synthesize_detection_arrays(48)
        # deterministic at fixed flags
        np.testing.assert_array_equal(img_a, img_b)
        np.testing.assert_array_equal(lab_a, lab_b)
        with FLAGS.scope(synthetic_det_noise=48.0, synthetic_det_amp=70.0,
                         synthetic_det_min_div=6, synthetic_det_max_div=3):
            img_h, lab_h = ds.synthesize_detection_arrays(48)
        # hard regime: same box placement stream, smaller boxes, noisy pixels
        assert not np.array_equal(img_a, img_h)
        v = lab_h[..., 5] > 0
        heights = (lab_h[..., 3] - lab_h[..., 1])[v] * 64
        assert heights.max() <= 64 // 3 + 1
        assert heights.min() >= 64 // 6 - 1
        # per-pixel noise really landed (clean regime has flat background)
        corner = img_h[:, :4, :4, 0].astype(np.int32)
        assert corner.std() > np.clip(img_a[:, :4, :4, 0], 100, 155).std()


def test_pad_random_crop_and_flip_shapes():
    from pocketflow_tpu.datasets import augment
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    out = augment.pad_random_crop(x, jax.random.PRNGKey(0), pad=2)
    assert out.shape == x.shape
    flipped = augment.random_flip_lr(x, jax.random.PRNGKey(1))
    assert flipped.shape == x.shape
    # flipping twice with the same key restores the original
    np.testing.assert_array_equal(
        np.asarray(augment.random_flip_lr(flipped, jax.random.PRNGKey(1))),
        np.asarray(x))


def test_voc_flip_augment_mirrors_boxes():
    from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset
    with FLAGS.scope(voc_image_size=32, nb_bboxs_max=2, batch_size=4):
        ds = PascalVocDataset(is_train=True)
        images = jnp.zeros((4, 32, 32, 3), jnp.uint8)
        labels = np.zeros((4, 2, 6), np.float32)
        labels[:, 0] = [1, 0.2, 0.1, 0.6, 0.3, 1.0]  # xmin=0.1, xmax=0.3
        batch = ds.augment_batch({'image': images, 'label': jnp.asarray(labels)},
                                 jax.random.PRNGKey(0), True)
        out = np.asarray(jax.device_get(batch['label']))
        for i in range(4):
            xmin, xmax = out[i, 0, 2], out[i, 0, 4]
            assert (abs(xmin - 0.1) < 1e-5 and abs(xmax - 0.3) < 1e-5) or \
                   (abs(xmin - 0.7) < 1e-5 and abs(xmax - 0.9) < 1e-5)
            assert xmin < xmax


def test_frcnn_warm_start_grafts_backbone(tmp_path):
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    from pocketflow_tpu.learners.abstract_learner import TrainState
    from pocketflow_tpu.nets.faster_rcnn_at_pascalvoc import ModelHelper
    with FLAGS.scope(voc_image_size=64, nb_bboxs_max=4, batch_size=2,
                     batch_size_eval=2, nb_smpls_train=32, nb_smpls_eval=16,
                     frcnn_nb_proposals=8, frcnn_nb_pre_nms=32,
                     save_path=str(tmp_path / 'cls' / 'model.ckpt')):
        helper = ModelHelper()
        model = helper.create_model()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                               train=False))()
        # fake classification ckpt whose conv_init matches the backbone stem
        stem = variables['params']['backbone']['conv_init']['kernel']
        src = TrainState(step=jnp.asarray(1), params={
            'conv_init': {'kernel': jnp.full(stem.shape, 3.0)}},
            batch_stats={}, opt_state=(), extra=None)
        ckpt_lib.save(str(tmp_path / 'cls' / 'model.ckpt'), src, 1)
        state = TrainState(step=jnp.asarray(0), params=variables['params'],
                           batch_stats=variables.get('batch_stats', {}),
                           opt_state=(), extra=None)
        out = helper.warm_start(state)
        np.testing.assert_array_equal(
            np.asarray(out.params['backbone']['conv_init']['kernel']), 3.0)


def test_random_crop_resize_aspect_distortion():
    """Inception-style train crop: aspect ratios actually vary and output is
    fixed-shape."""
    import jax
    import jax.numpy as jnp
    from pocketflow_tpu.datasets import augment
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, size=(8, 64, 64, 3),
                                      dtype=np.uint8))
    out = augment.random_crop_resize(images, jax.random.PRNGKey(1), (32, 32))
    assert out.shape == (8, 32, 32, 3) and out.dtype == jnp.uint8
    # different key -> different crops (stochastic)
    out2 = augment.random_crop_resize(images, jax.random.PRNGKey(2), (32, 32))
    assert np.any(np.asarray(out) != np.asarray(out2))


def test_center_crop_resize_is_deterministic_bilinear():
    import jax.numpy as jnp
    from pocketflow_tpu.datasets import augment
    ramp = np.tile(np.arange(64, dtype=np.uint8)[None, :, None], (64, 1, 3))
    images = jnp.asarray(ramp[None])
    out = np.asarray(augment.center_crop_resize(images, (32, 32)))
    assert out.shape == (1, 32, 32, 3)
    # a horizontal ramp stays monotone after bilinear center crop+resize
    assert np.all(np.diff(out[0, 16, :, 0].astype(int)) >= 0)


def test_full_frame_ilsvrc_storage_and_extent_crops(tmp_path):
    """VERDICT r2 #7: the ILSVRC converter keeps the FULL frame (fixed
    padded container + valid-extent metadata) and the on-device crops
    sample only inside each sample's valid extent."""
    import jax
    from PIL import Image
    from pocketflow_tpu.datasets import augment
    from pocketflow_tpu.tools import convert_ilsvrc12 as cv

    # three aspect ratios: landscape, portrait, panorama
    src = tmp_path / 'imgs'
    for cls, (w, h) in (('a', (100, 80)), ('b', (60, 120)), ('c', (200, 50))):
        (src / cls).mkdir(parents=True)
        Image.new('RGB', (w, h), (200, 150, 100)).save(src / cls / 'x.png')
    dst = tmp_path / 'shards'
    total = cv.convert_imagefolder(str(src), str(dst), 'train', resize=48,
                                   shard_size=8, full_frame=True)
    assert total == 3
    imgs = np.load(str(dst / 'train_images_00000.npy'))
    exts = np.load(str(dst / 'train_extents_00000.npy'))
    cw = cv.container_width(48)
    assert imgs.shape == (3, 48, cw, 3)
    # landscape 100x80 -> scale 48/80: full frame retained
    np.testing.assert_array_equal(exts[0], [48, 60])
    # portrait 60x120 -> height bound: the WHOLE frame fits (long side 48)
    np.testing.assert_array_equal(exts[1], [48, 24])
    # panorama 200x50 -> width bound by the container
    assert exts[2][1] == cw and exts[2][0] < 48
    # padding is zero outside the valid extent, content inside
    assert imgs[1, :, 30:, :].max() == 0
    assert imgs[1, :48, :24, :].min() > 0

    # dataset round-trip: labels ride as [class, vh, vw]; augment_batch
    # unpacks to int labels + extent-restricted crops
    from pocketflow_tpu.config import FLAGS as _F
    from pocketflow_tpu.datasets.ilsvrc12 import Ilsvrc12Dataset
    with _F.scope(data_dir_local=str(dst), batch_size=3, synthetic_data=False,
                  enbl_native_loader=False):
        ds = Ilsvrc12Dataset(is_train=True)
        images, labels = ds._load_arrays()
        assert labels.shape == (3, 3)
        it = ds.build()
        batch = next(it)
        out = jax.jit(lambda b: ds.augment_batch(
            {k: jnp.asarray(v) for k, v in b.items()},
            jax.random.PRNGKey(0), True))(batch)
        assert out['label'].dtype == jnp.int32 and out['label'].ndim == 1
        assert out['image'].shape == (3, 224, 224, 3)

    # crops never blend padding: a constant-200 image padded with zeros
    # must stay ~200 everywhere after extent-aware cropping
    img = np.zeros((1, 48, cw, 3), np.uint8)
    img[0, :40, :30] = 200
    for seed in range(4):
        cropped = augment.random_crop_resize(
            jnp.asarray(img), jax.random.PRNGKey(seed), (16, 16),
            valid_hw=jnp.asarray([[40.0, 30.0]]))
        assert int(np.asarray(cropped).min()) >= 199, seed
    cc = augment.center_crop_resize(jnp.asarray(img), (16, 16),
                                    valid_hw=jnp.asarray([[40.0, 30.0]]))
    assert int(np.asarray(cc).min()) >= 199


def test_augment_xy_unpacks_packed_labels():
    """Custom learner steps consume batches through augment_xy /
    augment_images; on full-frame ILSVRC storage the packed [n, 3]
    (class, vh, vw) label rows must come back as plain int classes —
    feeding batch['label'] raw into calc_loss would one_hot a float
    [B, 3] row (the round-3 review finding this locks down)."""
    import jax
    from pocketflow_tpu.config import FLAGS as _F
    from pocketflow_tpu.datasets.ilsvrc12 import Ilsvrc12Dataset

    with _F.scope(batch_size=2, synthetic_data=True):
        ds = Ilsvrc12Dataset(is_train=True)
    packed = {'image': jnp.zeros((2, 48, 64, 3), jnp.uint8),
              'label': jnp.asarray([[7.0, 40.0, 30.0], [3.0, 48.0, 64.0]])}
    for is_train in (True, False):
        images, labels = jax.jit(
            lambda b, t=is_train: ds.augment_xy(b, jax.random.PRNGKey(0), t)
        )(packed)
        assert labels.dtype == jnp.int32 and labels.shape == (2,)
        np.testing.assert_array_equal(np.asarray(labels), [7, 3])
        assert images.shape == (2, 224, 224, 3)
    assert ds.augment_images(packed, jax.random.PRNGKey(0), False).shape \
        == (2, 224, 224, 3)
    # plain int labels pass through untouched
    plain = {'image': jnp.zeros((2, 224, 224, 3), jnp.uint8),
             'label': jnp.asarray([1, 2], jnp.int32)}
    _, labels = ds.augment_xy(plain, jax.random.PRNGKey(0), True)
    np.testing.assert_array_equal(np.asarray(labels), [1, 2])


def test_ilsvrc_image_size_and_mild_augment_flags():
    """The parity strips run ILSVRC models at reduced resolution with
    crop-free train preprocessing (--ilsvrc_image_size / --ilsvrc_augment):
    the spec must follow the size override, and 'mild' train augmentation
    must be deterministic up to horizontal flip (no random crops)."""
    import jax
    from pocketflow_tpu.datasets.ilsvrc12 import Ilsvrc12Dataset

    with FLAGS.scope(batch_size=2, synthetic_data=True, ilsvrc_image_size=96,
                     ilsvrc_augment='mild'):
        ds = Ilsvrc12Dataset(is_train=True)
        assert ds.spec.image_shape == (96, 96, 3)
        imgs, _ = ds.synthesize_arrays(4)
        assert imgs.shape[1:] == (96, 96, 3)
        batch = jnp.asarray(imgs[:2])
        outs = [np.asarray(ds.augment(batch, jax.random.PRNGKey(s), True))
                for s in range(6)]
        base = np.asarray(ds.augment(batch, jax.random.PRNGKey(0), False))
        for out in outs:  # every draw is the eval image or its mirror
            for i in range(2):
                same = np.allclose(out[i], base[i], atol=1e-5)
                flipped = np.allclose(out[i], base[i][:, ::-1], atol=1e-5)
                assert same or flipped

    with FLAGS.scope(batch_size=2, synthetic_data=True, ilsvrc_image_size=96):
        ds = Ilsvrc12Dataset(is_train=True)
        # default 'inception' augment still randomizes crops on oversized input
        big = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, size=(2, 128, 128, 3), dtype=np.uint8))
        a = np.asarray(ds.augment(big, jax.random.PRNGKey(1), True))
        b = np.asarray(ds.augment(big, jax.random.PRNGKey(2), True))
        assert a.shape == (2, 96, 96, 3)
        assert not np.allclose(a, b)


def test_no_learner_consumes_raw_batch_labels():
    """Source-scan guard: every custom learner step must go through
    augment_xy / augment_images / augment_batch — the raw
    `augment(batch['image']) + batch['label']` pattern silently breaks on
    packed full-frame label rows."""
    import glob as _glob
    root = os.path.join(os.path.dirname(__file__), '..', 'pocketflow_tpu',
                        'learners')
    offenders = []
    for path in _glob.glob(os.path.join(root, '**', '*.py'), recursive=True):
        with open(path) as fh:
            src = fh.read()
        if "augment(batch['image']" in src or "batch['label']" in src:
            offenders.append(os.path.relpath(path, root))
    assert not offenders, offenders
