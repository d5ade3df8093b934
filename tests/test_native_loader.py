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


def test_native_sampler_deterministic_across_thread_counts():
    """DETERMINISM CONTRACT: batch stream depends on seed, never nb_threads."""
    _lib_or_skip()
    from pocketflow_tpu.datasets.native_loader import NativeSampler
    n = 96
    images = (np.arange(n, dtype=np.uint8).reshape(n, 1, 1, 1)
              * np.ones((1, 2, 2, 1), np.uint8))
    labels = np.arange(n, dtype=np.int32)

    def stream(nb_threads, nb_batches=20):
        s = NativeSampler(images, labels, batch_size=8, shuffle=True, seed=7,
                          nb_threads=nb_threads, queue_depth=3)
        out = [next(s)['label'].copy() for _ in range(nb_batches)]
        s.close()
        return np.stack(out)

    ref = stream(1)
    np.testing.assert_array_equal(stream(4), ref)
    np.testing.assert_array_equal(stream(8), ref)


def _write_npy_shards(tmp_path, n_per_shard=(10, 7, 15), item_shape=(4, 4, 3)):
    import os
    paths = []
    total = sum(n_per_shard)
    base = np.arange(total, dtype=np.uint8)
    start = 0
    for i, n in enumerate(n_per_shard):
        arr = (base[start:start + n, None, None, None]
               * np.ones((1,) + item_shape, np.uint8))
        p = os.path.join(str(tmp_path), 'train_images_%02d.npy' % i)
        np.save(p, arr)
        paths.append(p)
        start += n
    labels = base.astype(np.int32)
    return paths, labels


def test_sharded_view_slicing_and_gather(tmp_path):
    from pocketflow_tpu.datasets.shards import ShardedView
    paths, labels = _write_npy_shards(tmp_path)
    view = ShardedView.from_npy_files(paths)
    assert len(view) == 32 and view.shape == (32, 4, 4, 3)
    # strided selection (process sharding) composes lazily
    sub = view[1::2]
    assert len(sub) == 16
    np.testing.assert_array_equal(sub.global_index(), np.arange(1, 32, 2))
    # split-of-selection composes
    head = sub[:4]
    np.testing.assert_array_equal(head.global_index(), [1, 3, 5, 7])
    # fancy gather crosses shard boundaries correctly
    got = view[np.array([0, 9, 10, 16, 17, 31])]
    np.testing.assert_array_equal(got[:, 0, 0, 0], [0, 9, 10, 16, 17, 31])
    # file table round-trips the npy headers
    fpaths, offsets, counts = view.file_table()
    assert counts == [10, 7, 15] and all(o > 0 for o in offsets)


def test_native_file_sampler_matches_flat(tmp_path):
    """pread shard streaming must yield the SAME stream as the in-RAM path."""
    _lib_or_skip()
    from pocketflow_tpu.datasets.native_loader import NativeSampler
    from pocketflow_tpu.datasets.shards import ShardedView
    paths, labels = _write_npy_shards(tmp_path)
    view = ShardedView.from_npy_files(paths)
    flat = view.materialize()
    kw = dict(batch_size=8, shuffle=True, seed=3, queue_depth=2)
    s_file = NativeSampler(view, labels, nb_threads=4, **kw)
    s_flat = NativeSampler(flat, labels, nb_threads=1, **kw)
    for _ in range(12):
        a, b = next(s_file), next(s_flat)
        np.testing.assert_array_equal(a['image'], b['image'])
        np.testing.assert_array_equal(a['label'], b['label'])
    s_file.close()
    s_flat.close()


def test_native_file_sampler_with_selection(tmp_path):
    """Process-shard selection: only selected rows are ever served."""
    _lib_or_skip()
    from pocketflow_tpu.datasets.native_loader import NativeSampler
    from pocketflow_tpu.datasets.shards import ShardedView
    paths, labels = _write_npy_shards(tmp_path)
    view = ShardedView.from_npy_files(paths)[1::2]  # odd rows only
    sel_labels = labels[1::2]
    s = NativeSampler(view, sel_labels, batch_size=4, shuffle=True, seed=0)
    seen = set()
    for _ in range(4):  # one epoch over the 16 selected rows
        batch = next(s)
        np.testing.assert_array_equal(batch['image'][:, 0, 0, 0],
                                      batch['label'].astype(np.uint8))
        seen.update(batch['label'].tolist())
    assert seen == set(range(1, 32, 2))
    s.close()


def test_ilsvrc12_streams_shards_without_concat(tmp_path, monkeypatch):
    """The ImageNet loader must NOT materialize shards into RAM."""
    import numpy as _np
    from pocketflow_tpu.datasets.ilsvrc12 import Ilsvrc12Dataset
    from pocketflow_tpu.datasets.shards import ShardedView
    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(str(tmp_path / ('train_images_%02d.npy' % i)),
                rng.integers(0, 255, size=(6, 8, 8, 3), dtype=np.uint8))
        np.save(str(tmp_path / ('train_labels_%02d.npy' % i)),
                rng.integers(0, 10, size=(6,), dtype=np.int64))
    real_concat = _np.concatenate

    def guarded_concat(arrays, *a, **k):
        for arr in arrays:
            assert np.asarray(arr).ndim <= 1, \
                'image shards must never be concatenated'
        return real_concat(arrays, *a, **k)

    monkeypatch.setattr(_np, 'concatenate', guarded_concat)
    with FLAGS.scope(data_dir_local=str(tmp_path), batch_size=4,
                     synthetic_data=False):
        ds = Ilsvrc12Dataset(is_train=True)
        images, labels = ds._load_arrays()
        assert isinstance(images, ShardedView) and len(images) == 12
        it = ds.build()
        batch = next(it)
        assert batch['image'].shape == (4, 8, 8, 3)
        assert batch['image'].dtype == np.uint8
