"""Model zoo: model helpers binding nets to datasets."""

from pocketflow_tpu.nets.abstract_model_helper import AbstractModelHelper  # noqa: F401
