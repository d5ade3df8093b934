"""The north-star composed pipeline: channel-prune -> QAT -> export.

BASELINE.json's target sentence composes the two flagship learners ("QAT +
channel-pruned ResNet-50 ... <=0.3% top-1 delta"), and the reference's test
matrix chains its learners over the same model
(/root/reference/docs/docs/test_cases.md).  Every parity strip so far
measured ONE learner at a time; this experiment measures the stack on the
calibrated ResNet-20 parity-hard strip:

1. train the full-prec baseline;
2. LASSO channel-prune @50% preserve + schedule finetune (the strip's best
   CP variant, channel@50%+sched);
3. QAT-finetune the PRUNED checkpoint at 8/8 bits with the channel masks
   held (masked grads + post-update re-zero, the same composition contract
   the CP learner's own finetune uses) — cross-learner transport via
   checkpoint.restore_fields, the rebuild's analogue of the reference's
   variable-scope renamed restores;
4. export: residual-aware channel shrink of the final params
   (tools/shrink_graph) — records the physical packed-parameter fraction;
5. lock the stacked accuracy delta + pruned-channel fraction as bands.

Throughput of the composed (masked + fake-quant) ResNet-50 train step is
reported by bench.py as the labeled extra `value_pruned_qat`.

Run on the chip:  python experiments/composed_cp_qat.py --publish
Smoke:            python experiments/composed_cp_qat.py --quick
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import jax
import jax.numpy as jnp
import numpy as np

import pocketflow_tpu  # noqa: F401
from pocketflow_tpu.config import FLAGS

import synthetic_parity  # the strip regime + baseline band live there

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'results', 'composed_cp_qat.json')

# Locked bands (measured on-chip — see RESULTS file).  The single-learner
# points measured channel@50%+sched at -0.0278 and uniform@8bit at +0.0015;
# the stacked budget allows the CP band plus quantization noise, two-sided
# like the detection strips (an "improvement" beyond regularization-scale
# is a baseline regression, VERDICT r4 weak #3).
LOCKED_MAX_STACKED_DELTA = 0.12
LOCKED_MIN_STACKED_DELTA = -0.09
# uniform 50%-preserve pruning must actually have pruned: the mask tree's
# zeroed input-channel fraction over CP-targeted kernels
MIN_PRUNED_CHANNEL_FRAC = 0.30
# the residual-aware shrink must physically remove parameters
MAX_PACKED_PARAM_FRAC = 0.80


def check_results(results):
    violations = []
    base = results.get('full-prec')
    if base is None:
        return ['full-prec baseline missing from results']
    quick = bool(results.get('_quick'))
    band = (0.0, 1.0) if quick else synthetic_parity.BASELINE_BAND
    if not band[0] <= base <= band[1]:
        violations.append('full-prec accuracy %.4f outside band [%.2f, %.2f]'
                          % (base, *band))
    delta = results.get('cp+qat@8bit_delta')
    if delta is None:
        violations.append('cp+qat@8bit stacked point missing from results')
    elif not quick:
        if delta > LOCKED_MAX_STACKED_DELTA:
            violations.append(
                'stacked delta %.4f exceeds locked band %.2f'
                % (delta, LOCKED_MAX_STACKED_DELTA))
        if delta < LOCKED_MIN_STACKED_DELTA:
            violations.append(
                'stacked delta %.4f "improves" past the two-sided floor %.2f '
                '— suspect a baseline/train-pipeline regression'
                % (delta, LOCKED_MIN_STACKED_DELTA))
    frac = results.get('pruned_channel_frac')
    if frac is None:
        violations.append('pruned_channel_frac missing from results')
    elif not quick and frac < MIN_PRUNED_CHANNEL_FRAC:
        violations.append('pruned channel fraction %.3f below %.2f — the '
                          'composed point did not actually prune'
                          % (frac, MIN_PRUNED_CHANNEL_FRAC))
    packed = results.get('packed_param_frac')
    if packed is not None and not quick and packed > MAX_PACKED_PARAM_FRAC:
        violations.append('packed param fraction %.3f above %.2f — the '
                          'shrink export removed too few parameters'
                          % (packed, MAX_PACKED_PARAM_FRAC))
    # the composition contract: the channel masks must survive the QAT
    # finetune untouched (masked grads + post-update re-zero).  A lower
    # after-QAT fraction means pruned channels regrew, i.e. the composed
    # point silently stopped measuring the stacked pipeline.
    frac_after = results.get('pruned_channel_frac_after_qat')
    if frac_after is None:
        violations.append('pruned_channel_frac_after_qat missing from results')
    elif frac is not None and abs(frac_after - frac) > 1e-4:
        violations.append(
            'pruned channel fraction changed across the QAT finetune '
            '(%.4f -> %.4f) — masks did not survive; the composed point is '
            'not measuring the stacked pipeline' % (frac, frac_after))
    return violations


def derive_channel_masks(params):
    """Input-channel masks from exactly-zero channels of the pruned params
    (the CP finetune's post-update keeps pruned channels at literal 0, so
    zero-column detection reconstructs the mask tree without needing the CP
    learner's extra state)."""
    stats = {'zeroed': 0, 'total': 0}

    def mk(leaf):
        if leaf.ndim == 4 and leaf.shape[2] > 1:
            k = np.asarray(jax.device_get(leaf), np.float32)
            alive = np.abs(k).sum(axis=(0, 1, 3)) > 0
            if not alive.all():
                stats['zeroed'] += int((~alive).sum())
                stats['total'] += int(alive.size)
                return jnp.asarray(alive.reshape(1, 1, -1, 1), jnp.float32)
            stats['total'] += int(alive.size)
        return jnp.ones((), jnp.float32)

    masks = jax.tree_util.tree_map(mk, params)
    frac = stats['zeroed'] / max(stats['total'], 1)
    return masks, frac


def run(workdir=None, quick=False):
    workdir = workdir or tempfile.mkdtemp(prefix='pf_composed_')
    results = {'_quick': bool(quick)}
    FLAGS.override(
        synthetic_data=True, synthetic_task='hard',
        synthetic_snr=synthetic_parity.HARD_TASK_SNR, nb_classes=64,
        compute_dtype='bfloat16', rand_seed=0,
        batch_size=128, batch_size_eval=128,
        nb_smpls_train=512 if quick else 4096, nb_smpls_eval=2048,
        lrn_rate_init=0.1, summ_step=400, save_step=10 ** 6,
        save_path=os.path.join(workdir, 'models/model.ckpt'),
        log_dir=os.path.join(workdir, 'logs'),
        resnet_size=20, nb_epochs_rat=0.02 if quick else 0.2)

    from pocketflow_tpu.core import checkpoint as ckpt_lib
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.learners.weight_sparsification import masking
    from pocketflow_tpu.nets.resnet_at_cifar10 import ModelHelper

    # 1. full-prec baseline
    learner = create_learner(None, ModelHelper(), learner_name='full-prec')
    state = learner.train()
    baseline = float(learner.run_eval_loop(
        state, learner.build_eval_step())['accuracy'])
    results['full-prec'] = baseline
    print(json.dumps({'full-prec': round(baseline, 4)}), flush=True)

    # 2. channel prune @50% preserve, schedule finetune
    cp_path = os.path.join(workdir, 'cp/model.ckpt')
    with FLAGS.scope(cp_prune_option='uniform', cp_uniform_preserve_ratio=0.5,
                     cp_nb_batches=6, cp_nb_points_per_layer=8,
                     cp_nb_iters_ft_ratio=1.0, cp_finetune_schedule=True,
                     cp_channel_pruned_path=cp_path):
        cpl = create_learner(None, ModelHelper(), learner_name='channel')
        cp_state = cpl.train()
        cp_acc = float(cpl.run_eval_loop(
            cp_state, cpl.build_eval_step())['accuracy'])
    results['channel@50%+sched'] = cp_acc
    results['channel@50%+sched_delta'] = round(baseline - cp_acc, 4)
    print(json.dumps({'channel@50%+sched': round(cp_acc, 4)}), flush=True)

    # 3. QAT 8/8 from the pruned checkpoint, channel masks held
    from pocketflow_tpu.learners.uniform_quantization.learner import (
        UniformQuantLearner)
    with FLAGS.scope(uql_weight_bits=8, uql_activation_bits=8,
                     uql_quant_epochs=30,
                     uql_save_quant_model_path=os.path.join(
                         workdir, 'cp_uql/model.ckpt')):
        uq = UniformQuantLearner(None, ModelHelper())
        state_q, tx, _ = uq.init_state_quant()
        fields = ckpt_lib.restore_fields(
            cp_path, {'params': state_q.params,
                      'batch_stats': state_q.batch_stats})
        if fields is None:
            raise FileNotFoundError('no channel-pruned checkpoint under '
                                    + cp_path)
        state_q = state_q.replace(params=fields['params'],
                                  batch_stats=fields['batch_stats'])
        masks, pruned_frac = derive_channel_masks(state_q.params)
        results['pruned_channel_frac'] = round(pruned_frac, 4)
        state_q = uq.set_extra(state_q, {**state_q.extra, 'masks': masks})

        def grad_transform(grads, state):
            return masking.mask_gradients(grads, state.extra['masks'])

        def post_update(state):
            return state.replace(params=masking.apply_masks(
                state.params, state.extra['masks']))

        train_step = uq.build_train_step(
            tx, policy_fn=uq._policy_fn(),
            grad_transform_fn=grad_transform, post_update_fn=post_update)
        eval_step = uq.build_quant_eval_step()
        state_q = uq.run_train_loop(
            state_q, train_step, nb_iters=uq.finetune_steps,
            save_path=FLAGS.uql_save_quant_model_path,
            eval_fn=lambda s: uq.run_eval_loop(s, eval_step))
        stacked = float(uq.run_eval_loop(state_q, eval_step)['accuracy'])
        # the masks must have survived the QAT finetune untouched
        _, frac_after = derive_channel_masks(state_q.params)
        results['pruned_channel_frac_after_qat'] = round(frac_after, 4)
    results['cp+qat@8bit'] = stacked
    results['cp+qat@8bit_delta'] = round(baseline - stacked, 4)
    print(json.dumps({'cp+qat@8bit': round(stacked, 4),
                      'delta': results['cp+qat@8bit_delta']}), flush=True)

    # 4. export: residual-aware physical shrink of the composed params
    from pocketflow_tpu.tools import shrink_graph as sg
    variables = {'params': jax.device_get(state_q.params),
                 'batch_stats': jax.device_get(state_q.batch_stats)}
    sample_shape = (1,) + learner.dataset_train.spec.image_shape
    graph = sg.capture_conv_graph(uq.model, variables, sample_shape)
    packed, manifest = sg.shrink_residual_aware(
        variables['params'], variables['batch_stats'], graph)
    dense = sum(int(np.asarray(x).size)
                for x in jax.tree_util.tree_leaves(variables))
    small = sum(int(np.asarray(x).size) for x in packed.values())
    results['packed_param_frac'] = round(small / max(dense, 1), 4)
    print(json.dumps({'packed_param_frac': results['packed_param_frac']}),
          flush=True)
    return results


def main():
    if '--check-file' in sys.argv:
        path = sys.argv[sys.argv.index('--check-file') + 1]
        with open(path) as fin:
            violations = check_results(json.load(fin))
        if violations:
            print('COMPOSED PIPELINE BAND VIOLATIONS:')
            for v in violations:
                print('  ' + v)
            sys.exit(1)
        print('composed cp+qat bands: evidence healthy')
        return
    out = run(quick='--quick' in sys.argv)
    out = {k: (round(float(v), 4) if not isinstance(v, (bool, str)) else v)
           for k, v in out.items()}
    print(json.dumps(out, indent=2))
    if '--publish' in sys.argv and '--quick' not in sys.argv:
        path = RESULTS
    else:
        path = os.path.join(
            os.environ.get('PF_PARITY_OUT', '/tmp/pf_parity_results'),
            'composed_cp_qat.json')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as fout:
        json.dump(out, fout, indent=2)
    print('results written to %s' % path)
    violations = check_results(out)
    if violations and '--quick' not in sys.argv:
        print('COMPOSED PIPELINE BAND VIOLATIONS:')
        for v in violations:
            print('  ' + v)
        sys.exit(1)


if __name__ == '__main__':
    main()
