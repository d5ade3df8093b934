"""Composed pipeline #2: weight-sparsify -> QAT -> sparse-int8 accounting.

The reference's test matrix chains its learners over the same model
(/root/reference/docs/docs/test_cases.md), and its two headline compression
families are weight sparsification (docs/docs/performance.md:21-26) and
8-bit QAT (:34-39).  `composed_cp_qat.py` locked the channel-prune -> QAT
stack; this experiment locks the OTHER flagship axis: magnitude sparsity
composed with quantization on the calibrated ResNet-20 parity-hard strip:

1. train the full-prec baseline;
2. weight-sparse @50% (uniform protocol, Zhu&Gupta schedule) — the strip's
   measured single-learner delta is -0.0029 (results/parity_hard.json);
3. QAT-finetune the SPARSE checkpoint at 8/8 bits with the element masks
   held (masked grads + post-update re-zero — the same composition contract
   the CP->QAT stack uses), transported via checkpoint.restore_fields;
4. lock the stacked accuracy delta and the mask-survival invariant: the
   maskable-weight zero fraction must be IDENTICAL before and after the QAT
   finetune, else the composed point silently stopped measuring the stack.

Run on the chip:  python experiments/composed_ws_qat.py --publish
Smoke:            python experiments/composed_ws_qat.py --quick
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
                       'results', 'composed_ws_qat.json')

# Locked bands — measured on-chip 2026-08-20 (see RESULTS file): stacked
# delta +0.0073 (single-learner points: weight-sparse@50% -0.0029,
# uniform@8bit +0.0015, results/parity_hard.json).  Band = the WS@50% band
# (0.05, itself ~2x margin + eval noise), two-sided like every other strip
# (an "improvement" beyond regularization scale is a baseline regression,
# VERDICT r4 weak #3).
LOCKED_MAX_STACKED_DELTA = 0.05
LOCKED_MIN_STACKED_DELTA = -0.09
# the uniform 50% magnitude pruning must actually have pruned: zero fraction
# over maskable kernels (the WS learner lands exactly at ws_prune_ratio)
MIN_SPARSITY_FRAC = 0.45


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
    delta = results.get('ws+qat@8bit_delta')
    if delta is None:
        violations.append('ws+qat@8bit stacked point missing from results')
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
    frac = results.get('sparsity_frac')
    if frac is None:
        violations.append('sparsity_frac missing from results')
    elif not quick and frac < MIN_SPARSITY_FRAC:
        violations.append('maskable zero fraction %.3f below %.2f — the '
                          'composed point did not actually sparsify'
                          % (frac, MIN_SPARSITY_FRAC))
    # composition contract: the element masks must survive the QAT finetune
    # untouched (masked grads + post-update re-zero).  A lower after-QAT
    # fraction means pruned weights regrew, i.e. the composed point silently
    # stopped measuring the stacked pipeline.
    frac_after = results.get('sparsity_frac_after_qat')
    if frac_after is None:
        violations.append('sparsity_frac_after_qat missing from results')
    elif frac is not None and abs(frac_after - frac) > 1e-4:
        violations.append(
            'maskable zero fraction changed across the QAT finetune '
            '(%.4f -> %.4f) — masks did not survive; the composed point is '
            'not measuring the stacked pipeline' % (frac, frac_after))
    return violations


def derive_sparse_masks(params):
    """Element masks from exactly-zero maskable weights (the WS learner's
    post-update keeps pruned weights at literal 0, so zero detection
    reconstructs the mask tree from the checkpoint alone — the same
    cross-learner transport idiom as composed_cp_qat.derive_channel_masks).
    Returns (mask tree shaped like masking.build_mask_state's, zero frac)."""
    from pocketflow_tpu.learners.weight_sparsification import masking
    stats = {'zeroed': 0, 'total': 0}

    def mk(path, leaf):
        if masking.is_maskable_path(path):
            w = np.asarray(jax.device_get(leaf), np.float32)
            alive = w != 0
            stats['zeroed'] += int((~alive).sum())
            stats['total'] += int(alive.size)
            return jnp.asarray(alive, jnp.float32)
        return jnp.ones((), jnp.float32)

    masks = jax.tree_util.tree_map_with_path(mk, params)
    frac = stats['zeroed'] / max(stats['total'], 1)
    return masks, frac


def run(workdir=None, quick=False):
    workdir = workdir or tempfile.mkdtemp(prefix='pf_composed_ws_')
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

    # 2. weight-sparse @50%, uniform protocol, Zhu&Gupta schedule
    ws_path = os.path.join(workdir, 'ws/model.ckpt')
    with FLAGS.scope(ws_prune_ratio=0.5, ws_prune_ratio_prtl='uniform',
                     ws_mask_update_step=20, ws_save_path=ws_path):
        wsl = create_learner(None, ModelHelper(), learner_name='weight-sparse')
        ws_state = wsl.train()
        ws_metrics = wsl.run_eval_loop(ws_state, wsl.build_sparse_eval_step())
        ws_acc = float(ws_metrics['accuracy'])
    results['weight-sparse@50%'] = ws_acc
    results['weight-sparse@50%_delta'] = round(baseline - ws_acc, 4)
    print(json.dumps({'weight-sparse@50%': round(ws_acc, 4)}), flush=True)

    # 3. QAT 8/8 from the sparse checkpoint, element masks held
    from pocketflow_tpu.learners.uniform_quantization.learner import (
        UniformQuantLearner)
    with FLAGS.scope(uql_weight_bits=8, uql_activation_bits=8,
                     uql_quant_epochs=30,
                     uql_save_quant_model_path=os.path.join(
                         workdir, 'ws_uql/model.ckpt')):
        uq = UniformQuantLearner(None, ModelHelper())
        state_q, tx, _ = uq.init_state_quant()
        fields = ckpt_lib.restore_fields(
            ws_path, {'params': state_q.params,
                      'batch_stats': state_q.batch_stats})
        if fields is None:
            raise FileNotFoundError('no weight-sparse checkpoint under '
                                    + ws_path)
        state_q = state_q.replace(params=fields['params'],
                                  batch_stats=fields['batch_stats'])
        masks, sparsity_frac = derive_sparse_masks(state_q.params)
        results['sparsity_frac'] = round(sparsity_frac, 4)
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
        _, frac_after = derive_sparse_masks(state_q.params)
        results['sparsity_frac_after_qat'] = round(frac_after, 4)
    results['ws+qat@8bit'] = stacked
    results['ws+qat@8bit_delta'] = round(baseline - stacked, 4)
    print(json.dumps({'ws+qat@8bit': round(stacked, 4),
                      'delta': results['ws+qat@8bit_delta']}), flush=True)
    return results


def main():
    if '--check-file' in sys.argv:
        with open(RESULTS) as f:
            payload = json.load(f)
        violations = check_results(payload)
        for v in violations:
            print('VIOLATION:', v)
        sys.exit(1 if violations else 0)
    out = run(quick='--quick' in sys.argv)
    print(json.dumps(out, indent=2))
    if '--publish' in sys.argv and '--quick' not in sys.argv:
        os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
        with open(RESULTS, 'w') as f:
            json.dump(out, f, indent=2)
        print('published ->', RESULTS)
    violations = check_results(out)
    for v in violations:
        print('VIOLATION:', v)
    if violations and '--quick' not in sys.argv:
        sys.exit(1)


if __name__ == '__main__':
    main()
