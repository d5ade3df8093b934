"""LeNet @ CIFAR-10 (rebuild of /root/reference/nets/lenet_at_cifar10.py:34-136).

Architecture: conv5x5(32)+relu+pool2 -> conv5x5(64)+relu+pool2 -> fc(256)+relu
-> fc(nb_classes); VALID-padded convs like tf.layers.conv2d defaults.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import schedules
from pocketflow_tpu.datasets.cifar10 import Cifar10Dataset
from pocketflow_tpu.nets.abstract_model_helper import AbstractModelHelper
from pocketflow_tpu.nn import PFConv, PFDense, max_pool, relu


class LeNet(nn.Module):
    nb_classes: int = 10
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = PFConv(32, (5, 5), padding='VALID', dtype=self.dtype, name='conv1')(x)
        x = relu(x)
        x = max_pool(x, (2, 2))
        x = PFConv(64, (5, 5), padding='VALID', dtype=self.dtype, name='conv2')(x)
        x = relu(x)
        x = max_pool(x, (2, 2))
        x = x.reshape((x.shape[0], -1))
        x = PFDense(256, dtype=self.dtype, name='fc3')(x)
        x = relu(x)
        x = PFDense(self.nb_classes, dtype=self.dtype, name='fc4')(x)
        return x.astype(jnp.float32)


class ModelHelper(AbstractModelHelper):
    """Model helper for LeNet @ CIFAR-10."""

    model_name = 'lenet'
    dataset_name = 'cifar_10'

    def __init__(self, data_format='channels_last'):
        super().__init__(data_format)
        self.dataset_train = Cifar10Dataset(is_train=True)
        self.dataset_eval = Cifar10Dataset(is_train=False)

    def build_dataset_train(self, enbl_trn_val_split=False):
        return self.dataset_train

    def build_dataset_eval(self):
        return self.dataset_eval

    def create_model(self):
        dtype = jnp.bfloat16 if FLAGS.compute_dtype == 'bfloat16' else jnp.float32
        return LeNet(nb_classes=self.dataset_train.spec.nb_classes, dtype=dtype)

    def calc_loss(self, labels, outputs, trainable_vars):
        loss = self.softmax_cross_entropy(labels, outputs)
        loss = loss + self.weight_decay_loss(trainable_vars, exclude_bn=False)
        metrics = {'accuracy': self.accuracy(labels, outputs)}
        return loss, metrics

    def setup_lrn_rate(self, global_batch_size: int):
        nb_epochs = 250
        nb_smpls_train = self.dataset_train.spec.nb_smpls_train
        schedule = schedules.piecewise_constant(
            global_batch_size, [100, 150, 200], [1.0, 0.1, 0.01, 0.001], nb_smpls_train)
        nb_iters = int(nb_smpls_train * nb_epochs * FLAGS.nb_epochs_rat / global_batch_size)
        return schedule, nb_iters
