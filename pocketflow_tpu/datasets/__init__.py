"""Dataset layer: host-side array pipelines + on-device augmentation."""

from pocketflow_tpu.datasets.abstract import AbstractDataset, DatasetSpec  # noqa: F401
from pocketflow_tpu.datasets import remote_fs  # noqa: F401  (registers --data_dir_hdfs)
