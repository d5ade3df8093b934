"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-device correctness is exercised via
XLA's host-platform device splitting so no TPU is needed for the suite.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize imports jax with JAX_PLATFORMS=axon baked in;
# update the already-imported config to force the CPU host platform.
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_flags(tmp_path):
    """Give each test an isolated save dir + synthetic data + small steps."""
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.core import mesh as mesh_lib
    mesh_lib.reset_global_mesh()
    with FLAGS.scope(
            synthetic_data=True,
            compute_dtype='float32',  # CPU tests: keep numerics tight
            save_path=str(tmp_path / 'models' / 'model.ckpt'),
            save_path_eval=str(tmp_path / 'models_eval' / 'model.ckpt'),
            log_dir=str(tmp_path / 'logs'),
            summ_step=50,
            save_step=1000000,
            rand_seed=0):
        yield
    mesh_lib.reset_global_mesh()
