"""Remote data-disk staging (--data_disk hdfs, datasets/remote_fs.py).

The reference joins data_hdfs_host + data_dir_hdfs and reads through TF's
HDFS driver (/root/reference/datasets/cifar10_dataset.py:85-94); the rebuild
stages the remote directory into a local cache once and points the numpy /
native loaders at the cache.  file:// hosts exercise the full path without a
Hadoop client.
"""

import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS


def _write_cifar_bin(dirpath, n=20, seed=0):
    rng = np.random.default_rng(seed)
    record = 1 + 3072
    raw = rng.integers(0, 256, size=(n * record,), dtype=np.uint8)
    raw.reshape(-1, record)[:, 0] %= 10
    dirpath.mkdir(parents=True, exist_ok=True)
    raw.tofile(dirpath / 'data_batch_1.bin')
    return raw.reshape(-1, record)[:, 0].astype(np.int32)


def test_hdfs_disk_stages_once_and_datasets_read_the_cache(tmp_path):
    from pocketflow_tpu.datasets.cifar10 import Cifar10Dataset
    from pocketflow_tpu.datasets.remote_fs import resolve_data_dir
    labels = _write_cifar_bin(tmp_path / 'remote' / 'cifar10')
    cache = tmp_path / 'cache'
    with FLAGS.scope(data_disk='hdfs',
                     data_hdfs_host='file://%s' % (tmp_path / 'remote'),
                     data_dir_hdfs='cifar10',
                     data_cache_dir=str(cache),
                     batch_size=4, nb_smpls_train=20, synthetic_data=False):
        staged = resolve_data_dir()
        import os
        assert staged is not None and staged.startswith(str(cache))
        assert os.path.exists(os.path.join(staged, 'data_batch_1.bin'))

        # the dataset reads the staged REAL records, not synthetic fallback
        ds = Cifar10Dataset(is_train=True)
        np.testing.assert_array_equal(ds._load_arrays()[1], labels)

        # second resolve hits the cache: staging dir is stable (no re-copy)
        import time
        mtime = os.path.getmtime(staged)
        time.sleep(0.05)
        assert resolve_data_dir() == staged
        assert os.path.getmtime(staged) == mtime


def test_hdfs_disk_requires_host_and_dir():
    from pocketflow_tpu.datasets.remote_fs import resolve_data_dir
    with FLAGS.scope(data_disk='hdfs', data_hdfs_host=None, data_dir_hdfs=None):
        with pytest.raises(ValueError, match='data_hdfs_host'):
            resolve_data_dir()
    with FLAGS.scope(data_disk='nfs'):
        with pytest.raises(ValueError, match='unrecognized data disk'):
            resolve_data_dir()


def test_stage_election_loser_waits_for_winner(tmp_path):
    """A process that loses the host-local staging election waits for the
    winner's copy to land (lock dir gone + dst present) instead of assuming
    a global primary staged it — multi-host pods have per-VM disks."""
    import os
    import threading
    from pocketflow_tpu.datasets import remote_fs

    _write_cifar_bin(tmp_path / 'remote' / 'cifar10')
    cache = tmp_path / 'cache'
    cache.mkdir()
    url = 'file://%s/cifar10' % (tmp_path / 'remote')
    import hashlib
    dst = os.path.join(str(cache), hashlib.sha1(url.encode()).hexdigest()[:16])
    os.mkdir(dst + '.lock')  # another process is mid-staging

    def winner_finishes():
        remote_fs._stage(url, dst)
        os.rmdir(dst + '.lock')

    t = threading.Timer(0.3, winner_finishes)
    t.start()
    try:
        with FLAGS.scope(data_disk='hdfs',
                         data_hdfs_host='file://%s' % (tmp_path / 'remote'),
                         data_dir_hdfs='cifar10', data_cache_dir=str(cache),
                         data_stage_timeout=30.0):
            assert remote_fs.resolve_data_dir() == dst
            assert os.path.exists(os.path.join(dst, 'data_batch_1.bin'))
    finally:
        t.join()


def test_stage_election_times_out_on_stale_lock(tmp_path):
    import hashlib
    import os
    from pocketflow_tpu.datasets import remote_fs

    (tmp_path / 'remote' / 'cifar10').mkdir(parents=True)
    cache = tmp_path / 'cache'
    cache.mkdir()
    url = 'file://%s/cifar10' % (tmp_path / 'remote')
    dst = os.path.join(str(cache), hashlib.sha1(url.encode()).hexdigest()[:16])
    os.mkdir(dst + '.lock')  # crashed run left the lock, no dst ever appears
    with FLAGS.scope(data_disk='hdfs',
                     data_hdfs_host='file://%s' % (tmp_path / 'remote'),
                     data_dir_hdfs='cifar10', data_cache_dir=str(cache),
                     data_stage_timeout=1.0):
        with pytest.raises(RuntimeError, match='stale lock'):
            remote_fs.resolve_data_dir()


def test_path_conf_routes_hdfs_entries(tmp_path):
    from pocketflow_tpu.utils.path_args import apply_path_conf
    conf = tmp_path / 'path.conf'
    conf.write_text('data_disk = hdfs\n'
                    'data_hdfs_host = file:///srv/data\n'
                    'data_dir_hdfs_cifar10 = cifar10-bins\n')
    with FLAGS.scope(data_disk='local', data_hdfs_host=None,
                     data_dir_hdfs=None):
        apply_path_conf('resnet_at_cifar10', str(conf))
        assert FLAGS.data_disk == 'hdfs'
        assert FLAGS.data_hdfs_host == 'file:///srv/data'
        assert FLAGS.data_dir_hdfs == 'cifar10-bins'
