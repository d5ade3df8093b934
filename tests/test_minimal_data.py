"""Minimal real-format dataset generator: every loader reads its output
through the REAL (non-synthetic) path (reference create_minimal.sh role)."""

import numpy as np

from pocketflow_tpu.config import FLAGS


def test_minimal_data_feeds_all_real_loaders(tmp_path):
    from pocketflow_tpu.tools import make_minimal_data as mk
    mk.main(['--dst_dir', str(tmp_path), '--nb_train', '40',
             '--nb_eval', '16'])

    from pocketflow_tpu.datasets.cifar10 import Cifar10Dataset
    with FLAGS.scope(data_dir_local=str(tmp_path / 'cifar10'),
                     synthetic_data=False, batch_size=8, nb_smpls_train=40,
                     nb_smpls_eval=16):
        images, labels = Cifar10Dataset(is_train=True)._load_arrays()
        assert images.shape == (40, 32, 32, 3) and images.dtype == np.uint8
        assert labels.min() >= 0 and labels.max() <= 9
        images_e, _ = Cifar10Dataset(is_train=False)._load_arrays()
        assert images_e.shape[0] == 16

    from pocketflow_tpu.datasets.ilsvrc12 import Ilsvrc12Dataset
    with FLAGS.scope(data_dir_local=str(tmp_path / 'ilsvrc12'),
                     synthetic_data=False, batch_size=8, nb_smpls_train=40,
                     nb_smpls_eval=16):
        images, labels = Ilsvrc12Dataset(is_train=True)._load_arrays()
        assert images.shape[0] == 40 and images.shape[-1] == 3
        assert np.asarray(labels).min() >= 1  # 0 = background

    from pocketflow_tpu.datasets.pascalvoc import PascalVocDataset
    with FLAGS.scope(data_dir_local=str(tmp_path / 'pascalvoc'),
                     synthetic_data=False, voc_image_size=300, batch_size=4,
                     nb_smpls_train=40, nb_smpls_eval=16):
        images, labels = PascalVocDataset(is_train=True)._load_arrays()
        assert images.shape[0] == 40 and images.shape[1] == 300
        # [class, ymin, xmin, ymax, xmax, validity]: at least one valid box
        assert (labels[:, :, 5] == 1.0).any()
        assert labels[labels[:, :, 5] == 1.0][:, 0].min() >= 1
