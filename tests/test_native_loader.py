"""Native (C++) data runtime tests: build, parse parity, sampler behavior."""

import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _lib_or_skip():
    from pocketflow_tpu.datasets.native_loader import get_lib
    lib = get_lib()
    if lib is None:
        pytest.skip('native toolchain unavailable')
    return lib


def test_native_cifar10_parse_matches_numpy():
    _lib_or_skip()
    from pocketflow_tpu.datasets.native_loader import parse_cifar10
    rng = np.random.default_rng(0)
    record = 1 + 32 * 32 * 3
    raw = rng.integers(0, 256, size=(50 * record,), dtype=np.uint8).astype(np.uint8)
    raw.reshape(-1, record)[:, 0] %= 10
    images, labels = parse_cifar10(raw)
    recs = raw.reshape(-1, record)
    np.testing.assert_array_equal(labels, recs[:, 0].astype(np.int32))
    expected = recs[:, 1:].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(images, expected)


def test_native_sampler_covers_all_samples():
    _lib_or_skip()
    from pocketflow_tpu.datasets.native_loader import NativeSampler
    n = 64
    images = np.arange(n, dtype=np.uint8).reshape(n, 1, 1, 1)
    images = np.broadcast_to(images, (n, 4, 4, 1)).copy()
    labels = np.arange(n, dtype=np.int32)
    sampler = NativeSampler(images, labels, batch_size=16, shuffle=True, seed=0)
    seen = set()
    for _ in range(4):  # one full epoch
        batch = next(sampler)
        assert batch['image'].shape == (16, 4, 4, 1)
        assert batch['label'].dtype == np.int32
        np.testing.assert_array_equal(batch['image'][:, 0, 0, 0],
                                      batch['label'].astype(np.uint8))
        seen.update(batch['label'].tolist())
    assert seen == set(range(n))  # epoch covers every sample exactly once
    sampler.close()


def test_native_sampler_detection_labels():
    _lib_or_skip()
    from pocketflow_tpu.datasets.native_loader import NativeSampler
    images = np.zeros((8, 4, 4, 3), np.uint8)
    labels = np.random.default_rng(0).normal(size=(8, 5, 6)).astype(np.float32)
    sampler = NativeSampler(images, labels, batch_size=4, shuffle=False, seed=0)
    batch = next(sampler)
    assert batch['label'].shape == (4, 5, 6)
    np.testing.assert_allclose(batch['label'], labels[:4], rtol=1e-6)
    sampler.close()


def test_dataset_uses_native_loader():
    from pocketflow_tpu.datasets.fmnist import FMnistDataset
    from pocketflow_tpu.datasets.native_loader import NativeSampler, get_lib
    with FLAGS.scope(batch_size=8, nb_smpls_train=128, enbl_native_loader=True):
        ds = FMnistDataset(is_train=True)
        it = ds.build()
        if get_lib() is not None:
            assert isinstance(it, NativeSampler)
        batch = next(it)
        assert batch['image'].shape[0] == 8
