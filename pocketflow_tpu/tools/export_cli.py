"""Export CLI: checkpoint -> deployment artifact.

Rebuild of the reference's standalone export scripts
(/root/reference/tools/conversion/export_pb_tflite_models.py etc.):

    python -m pocketflow_tpu.tools.export_cli --model=resnet_at_cifar10 \
        --ckpt_path=./models_cpg/model.ckpt --export_mode=chn-pruned \
        --output_path=./export/model

Modes: 'plain' (packed fp32), 'chn-pruned' (physically shrunk kernels +
channel manifest), 'quant' (int-packed weights + scales).  Every run performs
the numeric self-check and writes a StableHLO serving module when available.
"""

from __future__ import annotations

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from pocketflow_tpu.utils.devices import honor_jax_platforms
    honor_jax_platforms()
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.core import checkpoint as ckpt_lib
    from pocketflow_tpu.core.metrics import get_logger
    from pocketflow_tpu.tools import export as export_lib

    FLAGS.DEFINE_string('ckpt_path', './models/model.ckpt', 'checkpoint to export')
    FLAGS.DEFINE_string('export_mode', 'plain',
                        "export mode: 'plain' | 'chn-pruned' | "
                        "'chn-pruned-residual' (producer-side shrink across "
                        "skip connections) | 'quant'")
    FLAGS.DEFINE_string('output_path', './export/model', 'output artifact path')
    FLAGS.DEFINE_string('export_model', 'convnet_at_fmnist', 'model helper name')
    FLAGS.DEFINE_string('tflite_mode', 'none',
                        "also write a .tflite artifact: 'none' | 'float' | "
                        "'dynamic' (int8 weights) | 'int8' (full integer, "
                        "calibrated on the sample batch) | 'int8-qat' (full "
                        "integer carrying the uqtf learner's TRAINED "
                        "fake-quant ranges from the checkpoint; the "
                        "self-check runs against the QAT eval forward)")
    FLAGS.DEFINE_boolean('export_saved_model', False,
                         "also write a TF SavedModel at '<output>_saved' "
                         "(the reference's frozen-.pb serving artifact)")
    FLAGS.DEFINE_boolean('tflite_latency', False,
                         'measure TFLite interpreter latency after export '
                         '(100 warmup + 100 timed, reference '
                         'calc_inference_time.py protocol)')
    leftovers = FLAGS.parse_args(argv)
    del leftovers
    log = get_logger()

    from main import MODELS
    module = importlib.import_module(MODELS[FLAGS.export_model])
    helper = module.ModelHelper()
    model = helper.create_model()
    sample = helper.build_dataset_train().synthesize_arrays(2)[0] \
        if FLAGS.synthetic_data else next(helper.build_dataset_train().build())['image']
    sample = helper.build_dataset_train().augment(
        jnp.asarray(sample[:2]), jax.random.PRNGKey(0), False)
    variables = helper.init_model(jax.random.PRNGKey(0), sample)

    fields = ckpt_lib.restore_fields(FLAGS.ckpt_path, {
        'params': variables['params'],
        'batch_stats': variables.get('batch_stats', {})})
    if fields is None:
        raise FileNotFoundError('no checkpoint next to ' + FLAGS.ckpt_path)
    variables = {'params': fields['params'], 'batch_stats': fields['batch_stats']}

    if FLAGS.export_mode == 'chn-pruned-residual':
        # residual-aware physical shrink: producer-side channels removed
        # across skip connections (reference model_wrapper.py:31-369 +
        # channel_pruner.py:579-586), via the jaxpr capture trace
        from pocketflow_tpu.tools import shrink_graph as sg
        graph = sg.capture_conv_graph(model, variables, sample.shape)
        packed, manifest = sg.shrink_residual_aware(
            variables['params'], variables['batch_stats'], graph)
        # exactness self-check: scatter back to dense, logits must be equal
        dense_p, dense_s = sg.expand_to_dense(
            packed, manifest, variables['params'], variables['batch_stats'])
        delta = export_lib.numeric_self_check(
            model, variables,
            {'params': dense_p, 'batch_stats': dense_s}, sample, atol=0.0)
        if delta != 0.0:
            raise AssertionError(
                'residual shrink changed the model (max delta %.3e)' % delta)
        # FLOPs audit: conv FLOPs scale with kernel element count at fixed
        # spatial dims, so the shrunk/original kernel-size ratio is exact
        from pocketflow_tpu.tools.model_report import build_report
        report = build_report(model, variables['params'],
                              variables['batch_stats'], sample)
        flops_before = flops_after = 0.0
        for row in report['layers']:
            fl = row.get('flops')
            if fl is None and len(row['shape']) == 2:
                # dense kernels (shrunk by the residual pass when they
                # consume a pruned producer) are not in conv_layer_specs;
                # per-sample dense FLOPs = 2*in*out, same convention
                fl = 2.0 * float(np.prod(row['shape']))
            if fl is None:
                continue
            new = packed.get(row['layer'] + '/kernel')
            old_size = int(np.prod(row['shape']))
            flops_before += fl
            flops_after += fl * (new.size / old_size if new is not None else 1.0)
        manifest['flops_audit'] = {
            'flops_before': flops_before, 'flops_after': flops_after,
            'covers': 'conv + dense kernels',
            'reduction': 1.0 - (flops_after / flops_before
                                if flops_before else 1.0)}
        log.info('residual shrink FLOPs audit: %.3e -> %.3e (-%.1f%%)',
                 flops_before, flops_after,
                 100.0 * manifest['flops_audit']['reduction'])
    elif FLAGS.export_mode == 'chn-pruned':
        packed, manifest = export_lib.shrink_channel_pruned(variables['params'])
    elif FLAGS.export_mode == 'quant':
        from pocketflow_tpu.learners.uniform_quantization import utils as uq
        stats = uq.discover_quant_sites(model, variables, sample)
        packed = export_lib.pack_quantized(
            variables['params'], stats['weight_paths'],
            [FLAGS.uql_weight_bits] * stats['nb_matmuls'],
            bucket_type=FLAGS.uql_bucket_type if FLAGS.uql_use_buckets else None,
            bucket_size=FLAGS.uql_bucket_size)
        manifest = {'weight_bits': FLAGS.uql_weight_bits}
        log.info('quant export: %d tensors int-packed',
                 sum(1 for v in packed.values() if isinstance(v, dict)))
    else:
        packed = {k: np.asarray(v) for k, v in
                  ((('/'.join(str(getattr(p, "key", p)) for p in path)), leaf)
                   for path, leaf in jax.tree_util.tree_leaves_with_path(
                       variables['params']))}
        manifest = {}

    if FLAGS.export_mode != 'chn-pruned-residual':
        # the artifact must be self-contained for serving: BN running stats
        # ride along under the 'batch_stats/' prefix (the residual-shrink
        # packed tree already includes them)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                variables['batch_stats']):
            pstr = '/'.join(str(getattr(p, 'key', p)) for p in path)
            packed['batch_stats/' + pstr] = np.asarray(jax.device_get(leaf))

    out = export_lib.save_packed(packed, manifest, FLAGS.output_path + '.npz')
    export_lib.export_stablehlo(model, variables, sample,
                                FLAGS.output_path + '.stablehlo')
    # the REAL numeric self-check: reload the just-written artifact through
    # the serving loader and compare logits against the live model (for
    # 'quant' the delta is the quantization error, reported not gated)
    from pocketflow_tpu.tools import serving as serving_lib
    loaded_model, loaded_vars = serving_lib.load_serving_model(out, model)
    if FLAGS.export_mode == 'chn-pruned-residual':
        # exactness was already asserted above via expand_to_dense; the
        # width-mapped model has a different param tree, so compare logits
        a = np.asarray(jax.device_get(jax.jit(
            lambda v, x: model.apply(v, x, train=False))(variables, sample)))
        b = np.asarray(jax.device_get(jax.jit(
            lambda v, x: loaded_model.apply(v, x, train=False))(
                loaded_vars, sample)))
        delta = float(np.max(np.abs(a - b)))
        log.info('export self-check (shrunk serving): max |logits delta| '
                 '= %.3e', delta)
    else:
        delta = export_lib.numeric_self_check(
            model, variables, loaded_vars, sample)
    if FLAGS.export_mode in ('plain', 'chn-pruned') and delta > 1e-3:
        raise AssertionError(
            'export artifact diverged from the live model (max delta %.3e)'
            % delta)

    # serving artifacts target the PHYSICALLY SHRUNK model when the
    # residual-aware shrink ran (the reference's dedicated
    # export_chn_pruned_tflite_model.py builds the smaller convs, :223-277)
    serving_model, serving_vars = model, variables
    if FLAGS.export_mode == 'chn-pruned-residual' and hasattr(model, 'width_map'):
        from pocketflow_tpu.tools import shrink_graph as sg
        serving_model = model.clone(width_map=sg.width_map_from_packed(
            packed, manifest=manifest))
        serving_vars = sg.variables_from_packed(packed)
        log.info('serving artifacts use the width-mapped shrunk model')
    if FLAGS.export_saved_model:
        from pocketflow_tpu.tools import export_tflite as tflite_lib
        tflite_lib.export_saved_model(serving_model, serving_vars, sample,
                                      FLAGS.output_path + '_saved')
    if FLAGS.tflite_mode != 'none':
        from pocketflow_tpu.tools import export_tflite as tflite_lib
        quantize = {'float': 'none', 'int8-qat': 'int8'}.get(
            FLAGS.tflite_mode, FLAGS.tflite_mode)
        qat_spec = None
        if FLAGS.tflite_mode == 'int8-qat':
            # rebuild the uqtf learner's site table and restore its trained
            # EMA activation ranges from the checkpoint's extra tree
            from pocketflow_tpu.learners.uniform_quantization import utils as uq
            with FLAGS.scope(uql_quantize_all_layers=True):
                stats = uq.discover_quant_sites(serving_model, serving_vars,
                                                sample)
            nb_acts = stats['nb_activations']
            try:
                fields = ckpt_lib.restore_fields(FLAGS.ckpt_path, {
                    'extra': {'act_min': np.zeros(nb_acts, np.float32),
                              'act_max': np.full(nb_acts, 6.0, np.float32)}})
            except (KeyError, ValueError, TypeError):
                fields = None
            if fields is None or fields.get('extra') is None:
                raise ValueError(
                    'int8-qat export needs a uniform-tf checkpoint with '
                    'trained activation ranges (extra.act_min/act_max); '
                    'none found next to ' + FLAGS.ckpt_path)
            qat_spec = {
                'weight_paths': stats['weight_paths'],
                'act_min': np.asarray(fields['extra']['act_min']),
                'act_max': np.asarray(fields['extra']['act_max']),
                'weight_bits': int(FLAGS.uqtf_weight_bits),
                'act_bits': int(FLAGS.uqtf_activation_bits)}
        tfl_path = tflite_lib.export_tflite(
            serving_model, serving_vars, sample, FLAGS.output_path,
            quantize=quantize, input_uint8=(quantize == 'int8'),
            qat_spec=qat_spec)
        if FLAGS.tflite_latency:
            with open(tfl_path, 'rb') as fin:
                tflite_lib.measure_latency(fin.read())
    elif FLAGS.tflite_latency:
        log.warning('--tflite_latency ignored: no TFLite artifact was '
                    'exported (set --tflite_mode)')
    log.info('export written to %s', out)
    return out


if __name__ == '__main__':
    main(sys.argv[1:])
