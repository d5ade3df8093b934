"""Model audit report: per-layer params/FLOPs + compression summary.

The reference scatters FLOPs bookkeeping across the channel pruners
(channel_pruner.py:166-213) and logs compression ratios ad hoc; this tool
centralizes it: given a model helper (and optionally a compressed
checkpoint), print per-layer kernel shapes, parameter counts, conv FLOPs,
nonzero fractions, and surviving channel counts — the audit used to check a
compressed artifact before deployment.

    python -m pocketflow_tpu.tools.model_report --report_model=resnet_at_cifar10 \
        [--ckpt_path=./models_cpg/model.ckpt]
"""

from __future__ import annotations

import importlib
import sys
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_report(model, params, batch_stats, sample_images) -> Dict[str, Any]:
    from pocketflow_tpu.learners.channel_pruning.channel_pruner import (
        conv_layer_specs)
    from pocketflow_tpu.learners.weight_sparsification.masking import path_str

    specs = {s['path']: s for s in conv_layer_specs(
        model, params, batch_stats, sample_images)}
    rows: List[Dict[str, Any]] = []
    total_params, total_nnz, total_flops = 0, 0, 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        pstr = path_str(path)
        if not pstr.endswith('/kernel'):
            continue
        module = pstr[:-len('/kernel')]
        arr = np.asarray(jax.device_get(leaf))
        nnz = int(np.count_nonzero(arr))
        row = {'layer': module, 'shape': list(arr.shape),
               'params': int(arr.size), 'nnz_frac': nnz / max(arr.size, 1)}
        if arr.ndim == 4:
            norms = np.abs(arr).sum(axis=(0, 1, 3))
            row['in_channels_kept'] = int(np.count_nonzero(norms))
            row['in_channels'] = int(arr.shape[2])
        spec = specs.get(module)
        if spec is not None:
            row['flops'] = spec['flops']
            total_flops += spec['flops']
        rows.append(row)
        total_params += arr.size
        total_nnz += nnz
    return {
        'layers': rows,
        'total_params': int(total_params),
        'overall_sparsity': 1.0 - total_nnz / max(total_params, 1),
        'total_conv_flops': total_flops,
    }


def format_report(report: Dict[str, Any]) -> str:
    lines = ['%-28s %-20s %10s %8s %12s %s' % (
        'layer', 'shape', 'params', 'nnz%', 'flops', 'in-chns')]
    for row in report['layers']:
        lines.append('%-28s %-20s %10d %7.1f%% %12s %s' % (
            row['layer'], 'x'.join(map(str, row['shape'])), row['params'],
            row['nnz_frac'] * 100.0,
            ('%.3g' % row['flops']) if 'flops' in row else '-',
            ('%d/%d' % (row['in_channels_kept'], row['in_channels']))
            if 'in_channels' in row else '-'))
    lines.append('total params: %d | overall sparsity: %.2f%% | conv FLOPs: %.4g'
                 % (report['total_params'], report['overall_sparsity'] * 100.0,
                    report['total_conv_flops']))
    return '\n'.join(lines)


def main(argv=None):
    from pocketflow_tpu.utils.devices import honor_jax_platforms
    honor_jax_platforms()
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    try:
        from main import MODELS
    except ImportError:
        import os as _os
        sys.path.insert(0, _os.getcwd())
        from main import MODELS
    FLAGS.DEFINE_string('report_model', 'convnet_at_fmnist',
                        'model helper: ' + ' | '.join(sorted(MODELS)))
    FLAGS.DEFINE_string('report_ckpt', None, 'checkpoint to audit (optional)')
    FLAGS.parse_args(argv)

    module = importlib.import_module(MODELS[FLAGS.report_model])
    helper = module.ModelHelper()
    model = helper.create_model()
    ds = helper.build_dataset_train()
    sample = ds.augment(jnp.asarray(ds.synthesize_arrays(2)[0][:2]),
                        jax.random.PRNGKey(0), False)
    variables = helper.init_model(jax.random.PRNGKey(0), sample)
    params = variables['params']
    bstats = variables.get('batch_stats', {})
    if FLAGS.report_ckpt:
        fields = ckpt_lib.restore_fields(
            FLAGS.report_ckpt, {'params': params, 'batch_stats': bstats})
        if fields is None:
            raise FileNotFoundError('no checkpoint next to ' + FLAGS.report_ckpt)
        params, bstats = fields['params'], fields['batch_stats']
    report = build_report(model, params, bstats, sample)
    print(format_report(report))
    return report


if __name__ == '__main__':
    main(sys.argv[1:])
