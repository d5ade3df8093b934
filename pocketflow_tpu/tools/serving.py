"""Serving-side loader: any export artifact -> a runnable (model, variables).

The deploy-side counterpart of tools/export_cli: the reference's serving
story is "import the frozen .pb / .tflite and run" (its export tools verify
that with an output-equality test, export_chn_pruned_tflite_model.py:110-168).
Here the artifact is the packed .npz + manifest; this module reconstructs a
servable model from every export mode:

* 'plain'                — params + BN stats restored as-is;
* 'quant'                — int codes + per-bucket scales dequantized
                           (tools/export.unpack_quantized);
* 'chn-pruned'           — consumer-side-shrunk kernels scattered back to
                           dense shapes (zeros in pruned input channels), so
                           the unmodified model serves them exactly;
* 'chn-pruned-residual'  — the physically smaller network: the zoo model is
                           rebuilt with the manifest's width_map and serves
                           the shrunk tree directly.

    from pocketflow_tpu.tools.serving import load_serving_model
    model, variables = load_serving_model('export/model.npz', helper.create_model())
    logits = model.apply(variables, images, train=False)
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import numpy as np

from pocketflow_tpu.core.metrics import get_logger
from pocketflow_tpu.tools import export as export_lib
from pocketflow_tpu.tools import shrink_graph as sg

log = get_logger()


def _load_manifest(artifact_path: str) -> Dict[str, Any]:
    path = artifact_path if artifact_path.endswith('.npz') \
        else artifact_path + '.npz'
    with open(path + '.manifest.json') as fin:
        return json.load(fin)


def load_serving_model(artifact_path: str, model) -> Tuple[Any, Dict[str, Any]]:
    """Load a packed export artifact and return (serving_model, variables).

    `model` is the dense zoo model the checkpoint was exported from (e.g.
    `helper.create_model()`); for residual-shrunk artifacts it is rebuilt
    with the recorded width_map, otherwise returned unchanged.
    """
    packed = export_lib.load_packed(artifact_path)
    manifest = _load_manifest(artifact_path)

    # dequantize any int-packed entries (no-op for plain arrays)
    packed = export_lib.unpack_quantized(packed)

    if manifest.get('components'):
        # residual-aware shrink: serve the physically smaller network
        if hasattr(model, 'width_map'):
            model = model.clone(width_map=sg.width_map_from_packed(
                packed, manifest=manifest))
            log.info('serving the width-mapped shrunk model')
        variables = sg.variables_from_packed(packed)
        return model, variables

    # consumer-side channel pruning: scatter input channels back to dense
    # (zeros where pruned) so the unmodified model reproduces the outputs
    for pstr, info in manifest.items():
        if not (isinstance(info, dict) and 'kept_in_channels' in info):
            continue
        kernel = np.asarray(packed[pstr])
        dense_shape = list(kernel.shape)
        dense_shape[2] = int(info['orig_in_channels'])
        dense = np.zeros(dense_shape, kernel.dtype)
        dense[:, :, np.asarray(info['kept_in_channels'], np.int64), :] = kernel
        packed[pstr] = dense

    variables = sg.variables_from_packed(packed)
    if not variables['batch_stats']:
        log.warning('artifact has no batch_stats — BN models need an '
                    'artifact exported with them included')
    return model, variables


def main(argv=None):
    """CLI: load an artifact, run a forward self-check, report latency.

    python -m pocketflow_tpu.tools.serving --artifact=./export/model.npz \\
        --export_model=resnet_at_cifar10 [--serve_batch=64]
    """
    from pocketflow_tpu.utils.devices import honor_jax_platforms
    honor_jax_platforms()
    import sys

    import jax
    import jax.numpy as jnp

    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.tools.benchmark import calc_inference_time

    FLAGS.DEFINE_string('artifact', './export/model.npz', 'packed artifact')
    FLAGS.DEFINE_string('export_model', 'convnet_at_fmnist',
                        'model helper name')
    FLAGS.DEFINE_integer('serve_batch', 64, 'benchmark batch size')
    FLAGS.parse_args(argv)

    import importlib
    from main import MODELS
    module = importlib.import_module(MODELS[FLAGS.export_model])
    helper = module.ModelHelper()
    model, variables = load_serving_model(FLAGS.artifact,
                                          helper.create_model())
    ds = helper.build_dataset_eval()
    sample = ds.augment(jnp.asarray(ds.synthesize_arrays(2)[0][:2]),
                        jax.random.PRNGKey(0), False)
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, sample)
    log.info('forward OK: logits %s %s', logits.shape, logits.dtype)
    shape = (FLAGS.serve_batch,) + tuple(sample.shape[1:])
    calc_inference_time(model, variables, shape)
    return 0


if __name__ == '__main__':
    import sys
    sys.exit(main(sys.argv[1:]))
