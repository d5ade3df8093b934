"""Dataset layer: host-side array pipelines + on-device augmentation."""

from pocketflow_tpu.datasets.abstract import AbstractDataset, DatasetSpec  # noqa: F401
