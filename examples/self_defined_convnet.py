"""Tutorial: bring your own model + dataset to PocketFlow-TPU.

Parity with the reference's self-defined-models tutorial
(/root/reference/examples/convnet_at_fmnist.py + fmnist_dataset.py and
docs/docs/self_defined_models.md): define (1) a dataset, (2) a Flax module
built from the PF layers (so every compression learner can intercept its
kernels/activations), and (3) a ModelHelper binding them — then any learner
from `create_learner` works unchanged.

Run (CPU or TPU):
    python examples/self_defined_convnet.py --learner=weight-sparse \
        --ws_prune_ratio_prtl=uniform --ws_prune_ratio=0.5 --synthetic_data
"""

import sys

import jax.numpy as jnp
from flax import linen as nn

import pocketflow_tpu  # noqa: F401  (registers flags)
from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import schedules
from pocketflow_tpu.datasets.abstract import AbstractDataset, DatasetSpec
from pocketflow_tpu.learners import create_learner
from pocketflow_tpu.nets.abstract_model_helper import AbstractModelHelper
from pocketflow_tpu.nn import PFConv, PFDense, max_pool, relu


# -- 1. the dataset -----------------------------------------------------------

class MyDataset(AbstractDataset):
    """16x16 grayscale, 4 classes; synthetic unless data_dir_local is set."""

    SPEC = DatasetSpec(
        name='mydata', nb_classes=4,
        nb_smpls_train=2048, nb_smpls_val=256, nb_smpls_eval=512,
        batch_size=32, batch_size_eval=32, image_shape=(16, 16, 1))

    def _load_arrays(self):
        return self.synthesize_arrays()


# -- 2. the model (PF layers => compression-ready) ----------------------------

class MyConvNet(nn.Module):
    nb_classes: int = 4
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = PFConv(16, (3, 3), dtype=self.dtype, name='conv1')(x)
        x = relu(x)
        x = max_pool(x, (2, 2))
        x = PFConv(32, (3, 3), dtype=self.dtype, name='conv2')(x)
        x = relu(x)
        x = max_pool(x, (2, 2))
        x = x.reshape((x.shape[0], -1))
        x = PFDense(self.nb_classes, dtype=self.dtype, name='fc')(x)
        return x.astype(jnp.float32)


# -- 3. the helper ------------------------------------------------------------

class ModelHelper(AbstractModelHelper):
    model_name = 'myconvnet'
    dataset_name = 'mydata'

    def __init__(self):
        super().__init__()
        self.dataset_train = MyDataset(is_train=True)
        self.dataset_eval = MyDataset(is_train=False)

    def build_dataset_train(self, enbl_trn_val_split=False):
        return self.dataset_train

    def build_dataset_eval(self):
        return self.dataset_eval

    def create_model(self):
        return MyConvNet(nb_classes=self.dataset_train.spec.nb_classes)

    def calc_loss(self, labels, outputs, trainable_vars):
        loss = self.softmax_cross_entropy(labels, outputs)
        loss = loss + self.weight_decay_loss(trainable_vars, exclude_bn=False)
        return loss, {'accuracy': self.accuracy(labels, outputs)}

    def setup_lrn_rate(self, global_batch_size):
        nb_smpls = self.dataset_train.spec.nb_smpls_train
        schedule = schedules.piecewise_constant(
            global_batch_size, [10, 20], [1.0, 0.1, 0.01], nb_smpls)
        nb_iters = int(nb_smpls * 30 * FLAGS.nb_epochs_rat / global_batch_size)
        return schedule, nb_iters


def main(argv=None):
    FLAGS.parse_args(argv)
    learner = create_learner(None, ModelHelper())
    if FLAGS.exec_mode == 'train':
        learner.train()
    else:
        learner.evaluate()


if __name__ == '__main__':
    main(sys.argv[1:])
