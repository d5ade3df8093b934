"""path.conf parsing -> data-path flags.

Rebuild of /root/reference/utils/get_path_args.py:1-74 + get_data_dir.py: the
reference parses a `key = value` path.conf and injects --data_dir_* CLI flags
keyed by the dataset name parsed from the run-script FILENAME.  Here the
dataset comes from the model name ('resnet_at_cifar10' -> 'cifar10') and the
values land directly in FLAGS.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pocketflow_tpu.config import FLAGS

FLAGS.DEFINE_string('path_conf', './path.conf', 'path configuration file')


def parse_path_conf(path: str) -> Dict[str, str]:
    """Parse `key = value` lines; '#' comments and blanks ignored."""
    conf = {}
    if not os.path.exists(path):
        return conf
    with open(path) as fin:
        for line in fin:
            line = line.split('#', 1)[0].strip()
            if not line or '=' not in line:
                continue
            key, _, value = line.partition('=')
            conf[key.strip()] = value.strip()
    return conf


def dataset_of(model_name: str) -> str:
    """'resnet_at_cifar10' -> 'cifar10' (get_path_args.py:12-15 parses the
    dataset from the script filename the same way)."""
    return model_name.rsplit('_at_', 1)[-1]


def apply_path_conf(model_name: str, conf_path: Optional[str] = None):
    """Set data_dir_local (+ hdfs knobs) for the model's dataset."""
    conf = parse_path_conf(conf_path or FLAGS.path_conf)
    if not conf:
        return
    dataset = dataset_of(model_name)
    key_local = 'data_dir_local_%s' % dataset
    if key_local in conf and FLAGS.get('data_dir_local') is None:
        FLAGS.override(data_dir_local=conf[key_local])
    if 'data_disk' in conf:
        FLAGS.override(data_disk=conf['data_disk'])
    if conf.get('data_hdfs_host'):
        FLAGS.override(data_hdfs_host=conf['data_hdfs_host'])
    key_hdfs = 'data_dir_hdfs_%s' % dataset
    if conf.get(key_hdfs) and FLAGS.get('data_dir_hdfs') is None:
        # reference path.conf ships per-dataset data_dir_hdfs_* entries
        FLAGS.override(data_dir_hdfs=conf[key_hdfs])
