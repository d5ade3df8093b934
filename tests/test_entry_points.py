"""Entry layer tests: dispatcher, path.conf parsing, example tutorial."""

import os
import sys

import numpy as np
import pytest

from pocketflow_tpu.config import FLAGS

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_path_conf_parsing(tmp_path):
    from pocketflow_tpu.utils.path_args import (apply_path_conf, dataset_of,
                                                parse_path_conf)
    conf = tmp_path / 'path.conf'
    conf.write_text('# comment\ndata_disk = local\n'
                    'data_dir_local_cifar10 = /data/c10  # inline\n')
    parsed = parse_path_conf(str(conf))
    assert parsed == {'data_disk': 'local', 'data_dir_local_cifar10': '/data/c10'}
    assert dataset_of('resnet_at_cifar10') == 'cifar10'
    assert dataset_of('faster_rcnn_at_pascalvoc') == 'pascalvoc'
    # scope data_dir_local too: apply_path_conf writes it, and the scope exit
    # must roll that write back (no permanent overrides from tests)
    with FLAGS.scope(path_conf=str(conf), data_dir_local=None):
        apply_path_conf('resnet_at_cifar10')
        assert FLAGS.data_dir_local == '/data/c10'
    assert FLAGS.get('data_dir_local') is None


def test_main_dispatcher_runs_tiny_training(tmp_path):
    import main as dispatcher
    # parse_args mutates FLAGS permanently; scope() snapshots these keys so
    # the dispatcher's writes are rolled back when the test ends
    with FLAGS.scope(batch_size=None, batch_size_eval=None, nb_smpls_train=None,
                     nb_smpls_eval=None, nb_epochs_rat=1.0, lrn_rate_init=0.1,
                     learner='full-prec', summ_step=100):
        _dispatch(dispatcher, tmp_path)
    assert os.path.exists(str(tmp_path / 'models' / 'checkpoint'))


def _dispatch(dispatcher, tmp_path):
    dispatcher.main([
        '--model=convnet_at_fmnist', '--learner=full-prec',
        '--synthetic_data', '--batch_size=16', '--batch_size_eval=32',
        '--nb_smpls_train=256', '--nb_smpls_eval=64', '--nb_epochs_rat=0.005',
        '--lrn_rate_init=0.05', '--summ_step=100',
        '--save_path=%s' % (tmp_path / 'models' / 'model.ckpt'),
        '--log_dir=%s' % (tmp_path / 'logs'),
    ])


def test_example_self_defined_model(tmp_path):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'examples'))
    import self_defined_convnet as example
    with FLAGS.scope(nb_epochs_rat=0.01, lrn_rate_init=0.05,
                     save_path=str(tmp_path / 'models' / 'model.ckpt')):
        learner = example.create_learner(None, example.ModelHelper())
        state = learner.train()
        assert state is not None


def test_pick_devices():
    from pocketflow_tpu.utils.devices import list_devices, pick_devices
    assert len(list_devices()) == 8
    assert len(pick_devices(4)) == 4
    with pytest.raises(RuntimeError):
        pick_devices(99)
