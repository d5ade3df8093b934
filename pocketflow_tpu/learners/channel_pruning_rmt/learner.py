"""Channel pruning — "remastered" (chn-pruned-rmt).

Rebuild of /root/reference/learners/channel_pruning_rmt/learner.py:113-892.
Same He-2017 selection/reconstruction idea as the 'channel' learner, but with
everything solved *in-graph* instead of sklearn:

* **meta-LASSO** — ISTA proximal iterations with a fixed learning rate
  (``cpr_ista_lrn_rate`` x ``cpr_ista_nb_iters``, reference :432-468) select
  input channels at the target pruning ratio (top-(1-r) |beta| channels);
* **meta-least-square** — Adam iterations on the normal-equation gradient
  reconstruct the surviving kernel slice (``cpr_lstsq_*``, reference
  :470-523) instead of a closed-form solve;
* sampling uses a larger bank: ``cpr_nb_smpls`` images x
  ``cpr_nb_crops_per_smpl`` random positions (reference :525-560).

Both solvers are jitted `lax.scan` loops — the reference runs each ISTA/Adam
iteration as its own sess.run.  Layer skipping follows
``cpr_skip_frst_layer`` / ``cpr_skip_last_layer`` / ``cpr_skip_op_names``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.channel_pruning import channel_pruner as cp_lib
from pocketflow_tpu.learners.weight_sparsification import masking

FLAGS.DEFINE_string('cpr_save_path', './models_cpr/model.ckpt', "CPR: model's save path")
FLAGS.DEFINE_string('cpr_save_path_eval', './models_cpr_eval/model.ckpt',
                    "CPR: model's save path for evaluation")
FLAGS.DEFINE_string('cpr_save_path_ws', './models_cpr_ws/model.ckpt',
                    "CPR: model's save path for warm start")
FLAGS.DEFINE_float('cpr_prune_ratio', 0.5, 'CPR: pruning ratio')
FLAGS.DEFINE_boolean('cpr_skip_frst_layer', True, 'CPR: skip the first layer')
FLAGS.DEFINE_boolean('cpr_skip_last_layer', False, 'CPR: skip the last layer')
FLAGS.DEFINE_string('cpr_skip_op_names', None,
                    'CPR: comma-separated layer names to skip')
FLAGS.DEFINE_integer('cpr_nb_smpls', 5000, 'CPR: # of samples for regression')
FLAGS.DEFINE_integer('cpr_nb_crops_per_smpl', 10, 'CPR: # of random crops per sample')
FLAGS.DEFINE_float('cpr_ista_lrn_rate', 1e-2, "CPR: ISTA's learning rate")
FLAGS.DEFINE_integer('cpr_ista_nb_iters', 100, 'CPR: # of iterations in ISTA')
FLAGS.DEFINE_float('cpr_lstsq_lrn_rate', 1e-3,
                   "CPR: least-square regression's learning rate")
FLAGS.DEFINE_integer('cpr_lstsq_nb_iters', 100,
                     'CPR: # of iterations in least-square regression')
FLAGS.DEFINE_boolean('cpr_warm_start', False,
                     'CPR: warm-start from the weight-sparsified model')


def make_meta_lasso(nb_iters: int, lrn_rate: float):
    """ISTA with a fixed lr on the channel-selection LASSO (reference :432-468)."""
    @jax.jit
    def solve(P, y, alpha):
        P32, y32 = P.astype(jnp.float32), y.astype(jnp.float32)
        Pty = P32.T @ y32
        n = P32.shape[0]

        def body(beta, _):
            grad = (P32.T @ (P32 @ beta) - Pty) / n
            beta = beta - lrn_rate * grad
            return (jnp.sign(beta)
                    * jnp.maximum(jnp.abs(beta) - lrn_rate * alpha, 0.0)), None

        beta, _ = jax.lax.scan(body, jnp.zeros((P32.shape[1],), jnp.float32),
                               None, length=nb_iters)
        return beta
    return solve


def make_meta_lstsq(nb_iters: int, lrn_rate: float):
    """Adam on the normal-equation gradient (reference :470-523)."""
    tx = optax.adam(lrn_rate)

    @jax.jit
    def solve(X, Y, W0):
        """min ||Y - X W||^2; W0 is the [d, c_out] warm start."""
        X32, Y32 = X.astype(jnp.float32), Y.astype(jnp.float32)
        n = X32.shape[0]
        XtX = X32.T @ X32 / n
        XtY = X32.T @ Y32 / n

        def body(carry, _):
            W, opt_state = carry
            grad = 2.0 * (XtX @ W - XtY)
            updates, opt_state = tx.update(grad, opt_state, W)
            return (optax.apply_updates(W, updates), opt_state), None

        (W, _), _ = jax.lax.scan(body, (W0.astype(jnp.float32), tx.init(W0)),
                                 None, length=nb_iters)
        return W
    return solve


class ChannelPrunedRmtLearner(AbstractLearner):
    """Remastered channel pruning: in-graph ISTA + iterative least squares."""

    def __init__(self, sm_writer, model_helper):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)
        self.specs = None
        self.pruner = None

    # ------------------------------------------------------------------

    def _setup(self, state: TrainState):
        sample = self.dataset_train.peek_batch(2)  # no pipeline leak
        sample_images = self.dataset_train.augment_images(
            {k: jnp.asarray(v) for k, v in sample.items()},
            jax.random.PRNGKey(0), False)
        specs = cp_lib.conv_layer_specs(
            self.model, state.params, state.batch_stats, sample_images)
        skip_names = set()
        if FLAGS.cpr_skip_op_names:
            skip_names = set(FLAGS.cpr_skip_op_names.split(','))
        if FLAGS.cpr_skip_frst_layer and specs:
            skip_names.add(specs[0]['path'])
        if FLAGS.cpr_skip_last_layer and specs:
            skip_names.add(specs[-1]['path'])
        self.specs = [s for s in specs if s['path'] not in skip_names
                      and s['kernel_shape'][2] > 1]
        self.pruner = cp_lib.ChannelPruner(self.model, self.dataset_train, self.specs)
        self.meta_lasso = make_meta_lasso(FLAGS.cpr_ista_nb_iters,
                                          FLAGS.cpr_ista_lrn_rate)
        self.meta_lstsq = make_meta_lstsq(FLAGS.cpr_lstsq_nb_iters,
                                          FLAGS.cpr_lstsq_lrn_rate)

    def prune_all_layers(self, state: TrainState) -> TrainState:
        fbstats = state.batch_stats
        params = jax.device_get(self.copy_state(state).params)
        # original net on device = reconstruction target for every layer
        # (the reference's full-net placeholders); the current net mirrors
        # on device with only the pruned kernel re-uploaded per layer
        orig_dev = jax.device_put(params)
        cur_dev = jax.device_put(params)
        if getattr(self, '_cpr_train_iter', None) is None:
            self._cpr_train_iter = self.dataset_train.build()
        train_iter = self._cpr_train_iter
        # sample bank sized to cpr_nb_smpls x crops via the cp sampler knobs
        nb_batches = max(1, FLAGS.cpr_nb_smpls // max(
            1, self.dataset_train.batch_size))
        chn_masks = {}
        with FLAGS.scope(cp_nb_batches=min(nb_batches, FLAGS.cp_nb_batches * 4),
                         cp_nb_points_per_layer=FLAGS.cpr_nb_crops_per_smpl):
            for spec in self.specs:
                path = spec['path']
                h, w, c_in, c_out = spec['kernel_shape']
                ratio = FLAGS.cpr_prune_ratio
                c_keep = max(1, int(round((1.0 - ratio) * c_in)))
                X, Y = self.pruner.collect(spec, orig_dev, state.batch_stats,
                                           cur_dev, fbstats, train_iter,
                                           self.next_rng())
                kernel_dict = params
                cur_kernel = cur_dev
                for key in path.split('/'):
                    kernel_dict = kernel_dict[key]
                    cur_kernel = cur_kernel[key]
                W2 = np.asarray(kernel_dict['kernel'], np.float32)

                # meta-LASSO channel scores (top-(1-r) channels survive)
                rng = np.random.default_rng(FLAGS.rand_seed)
                picks = rng.integers(0, X.shape[0], min(400, max(1, X.shape[0] // 20)))
                Xs, Ys = X[picks], Y[picks]
                W2c = np.transpose(W2, (2, 0, 1, 3)).reshape(c_in, h * w, c_out)
                Xc = Xs.reshape(Xs.shape[0], c_in, h * w)
                contrib = np.einsum('pck,cko->pco', Xc, W2c)
                P = contrib.transpose(0, 2, 1).reshape(-1, c_in)
                beta = np.asarray(jax.device_get(self.meta_lasso(
                    jnp.asarray(P), jnp.asarray(Ys.reshape(-1)),
                    jnp.float32(1e-3))))
                order = np.argsort(-np.abs(beta))
                idxs = np.zeros(c_in, bool)
                idxs[order[:c_keep]] = True

                # meta-least-square reconstruction with warm start from W2
                Xsel = X[:, idxs].reshape(X.shape[0], -1)
                W0 = np.transpose(W2[:, :, idxs, :], (2, 0, 1, 3)).reshape(
                    int(idxs.sum()) * h * w, c_out)
                Wnew = np.asarray(jax.device_get(self.meta_lstsq(
                    jnp.asarray(Xsel), jnp.asarray(Y), jnp.asarray(W0))))
                Wnew = Wnew.reshape(int(idxs.sum()), h, w, c_out)
                new_kernel = np.zeros_like(W2)
                new_kernel[:, :, idxs, :] = np.transpose(Wnew, (1, 2, 0, 3))
                kernel_dict['kernel'] = new_kernel.astype(
                    np.asarray(kernel_dict['kernel']).dtype)
                cur_kernel['kernel'] = jax.device_put(kernel_dict['kernel'])
                chn_masks[path] = idxs.astype(np.float32)
                self.log.info('layer %s: kept %d/%d channels', path,
                              int(idxs.sum()), c_in)

        if jax.process_count() > 1:
            # per-process data shards select different channels/kernels —
            # broadcast the primary's results before stamping 'replicated'
            from pocketflow_tpu.core import mesh as mesh_lib
            params = jax.tree_util.tree_map(
                lambda a: np.asarray(jax.device_get(
                    mesh_lib.broadcast_from_primary(jnp.asarray(a)))), params)
            chn_masks = {k: np.asarray(jax.device_get(
                mesh_lib.broadcast_from_primary(jnp.asarray(v))))
                for k, v in chn_masks.items()}

        def mk(path, leaf):
            pstr = masking.path_str(path)
            for spec in self.specs:
                if pstr == spec['path'] + '/kernel':
                    return jnp.asarray(chn_masks[spec['path']].reshape(1, 1, -1, 1))
            return jnp.ones((), jnp.float32)

        masks = jax.tree_util.tree_map_with_path(mk, state.params)
        # set_extra keeps the TP state-sharding contract (like DCP/CPG)
        return self.set_extra(
            state.replace(params=jax.device_put(params, self.repl_sharding)),
            {'masks': masks})

    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        # meta-LASSO surgery rewrites kernels layer-by-layer on the host —
        # DP-only during the prune phase (see require_dp_only)
        self.require_dp_only('the meta-LASSO prune phase')
        state, tx, _ = self.init_state()
        if FLAGS.cpr_warm_start:
            state, _ = self.restore_baseline(state, FLAGS.cpr_save_path_ws)
        else:
            state, _ = self.restore_baseline(state)
        self._setup(state)
        state = self.prune_all_layers(state)

        def grad_transform(grads, state):
            return masking.mask_gradients(grads, state.extra['masks'])

        def post_update(state):
            return state.replace(params=masking.apply_masks(
                state.params, state.extra['masks']))

        loss_extra = self.helper_dst.loss_extra_fn() if self.helper_dst else None
        train_step = self.build_train_step(
            tx, loss_extra_fn=loss_extra,
            grad_transform_fn=grad_transform, post_update_fn=post_update)
        eval_step = self.build_eval_step()
        state = self.run_train_loop(
            state, train_step, save_path=FLAGS.cpr_save_path,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        self.run_eval_loop(state, eval_step)
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state()
        self._setup(state)

        def mk(path, leaf):
            pstr = masking.path_str(path)
            for spec in self.specs:
                if pstr == spec['path'] + '/kernel':
                    return jnp.ones((1, 1, leaf.shape[2], 1), jnp.float32)
            return jnp.ones((), jnp.float32)

        masks = jax.tree_util.tree_map_with_path(mk, state.params)
        state = state.replace(extra={'masks': masks})
        restored = self.restore_model(state, FLAGS.cpr_save_path)
        if restored is None:
            raise FileNotFoundError('no checkpoint found under ' + FLAGS.cpr_save_path)
        return self.run_eval_loop(restored, self.build_eval_step())
