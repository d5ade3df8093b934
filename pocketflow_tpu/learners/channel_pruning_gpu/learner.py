"""On-device channel pruning via proximal gradient descent (group LASSO).

Rebuild of /root/reference/learners/channel_pruning_gpu/learner.py:108-568.

Per maskable conv kernel (HWIO), input channels are selected by iterating:

    w   <- w - lr * d(reg_loss)/dw                      (SGD step)
    n_c  = ||w[:, :, c, :]||_2                          (per-input-channel norm)
    thr  = percentile(n, rising schedule -> target)
    w   <- w * max(1 - thr / n_c, 0)                    (group-LASSO shrinkage)

where reg_loss is the L2 distance between the pruned and full network's conv
outputs, and lr adapts (x1.4 on loss decrease, x0.7 on increase,
reference :445-518).  Channels whose norm hits zero stay zero afterwards
(channel masks + masked gradients), then a layer-reconstruction phase (Adam)
and a global fine-tune with the task loss run on the surviving channels.

TPU-first redesign: the reference prunes layers *sequentially*, one
`sess.run` per PGD iteration per layer.  Here all layers prune
*simultaneously* in ONE fused jitted step — layer inputs are
stop-gradient'ed (learners/capture.py) so the summed regression loss yields
each layer's independent gradient, and per-layer learning rates / percentile
schedules ride in as traced [L] vectors from the host.  1000 dispatches
total instead of 1000 x L.

The reconstruction phase (reference :385-392) uses a SCALE-INVARIANT Adam:
the per-tensor update is ``cpg_lrn_rate_adam * rms(w) * adam_direction``, so
each step moves a kernel by at most ~lr of its own RMS.  A fixed absolute lr
(the reference's plain Adam) silently assumes BN-normalized activations —
on BN-free backbones (VGG-SSD) a 1e-2 absolute kick on small-magnitude
kernels is a multi-x relative change whose output error compounds through
the depth; relative stepping removes the restriction so CPG works on
detection backbones too.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.capture import capture_forward
from pocketflow_tpu.learners.weight_sparsification import masking

FLAGS.DEFINE_string('cpg_save_path', './models_cpg/model.ckpt', "CPG: model's save path")
FLAGS.DEFINE_string('cpg_save_path_eval', './models_cpg_eval/model.ckpt',
                    "CPG: model's save path for evaluation")
FLAGS.DEFINE_string('cpg_prune_ratio_type', 'uniform',
                    "CPG: pruning ratio type ('uniform' | 'list')")
FLAGS.DEFINE_float('cpg_prune_ratio', 0.5, 'CPG: uniform pruning ratio')
FLAGS.DEFINE_boolean('cpg_skip_ht_layers', True, 'CPG: skip head & tail layers')
FLAGS.DEFINE_string('cpg_prune_ratio_file', None,
                    'CPG: file storing comma-separated per-layer pruning ratios')
FLAGS.DEFINE_float('cpg_lrn_rate_pgd_init', 1e-10, 'CPG: PGD initial learning rate')
FLAGS.DEFINE_float('cpg_lrn_rate_pgd_incr', 1.4, 'CPG: PGD lr increase ratio')
FLAGS.DEFINE_float('cpg_lrn_rate_pgd_decr', 0.7, 'CPG: PGD lr decrease ratio')
FLAGS.DEFINE_float('cpg_lrn_rate_adam', 1e-2, "CPG: Adam's learning rate")
FLAGS.DEFINE_integer('cpg_nb_iters_layer', 1000, 'CPG: # of iterations for layer-wise FT')


def channel_norms(kernel: jax.Array) -> jax.Array:
    """Per-input-channel L2 norm of an HWIO kernel -> [1, 1, I, 1]."""
    return jnp.sqrt(jnp.sum(jnp.square(kernel.astype(jnp.float32)),
                            axis=(0, 1, 3), keepdims=True))


def group_lasso_shrink(kernel: jax.Array, percentile: jax.Array) -> jax.Array:
    """max(1 - thr/||w_c||, 0) shrinkage at the given percentile (:375-383).

    percentile 0 (skipped head/tail layers) must be a NO-OP: quantile at 0
    returns the minimum channel norm, which would zero the weakest channel
    and shrink every other channel each PGD iteration."""
    norms = channel_norms(kernel)
    pct = jnp.clip(percentile / 100.0, 0.0, 1.0)
    thr = jnp.where(pct > 0.0, jnp.quantile(norms.reshape(-1), pct), 0.0)
    shrink = jnp.maximum(1.0 - thr / jnp.maximum(norms, 1e-20), 0.0)
    return (kernel.astype(jnp.float32) * shrink).astype(kernel.dtype)


class ChannelPrunedGpuLearner(AbstractLearner):
    """Channel pruning with on-device PGD channel selection."""

    def __init__(self, sm_writer, model_helper):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)

    # ------------------------------------------------------------------

    def prunable_paths(self, params) -> List[str]:
        """Conv kernels with prunable input channels (4-d, >1 input channel,
        excluding depthwise whose I==1)."""
        out = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            if masking.is_maskable_path(path) and leaf.ndim == 4 and leaf.shape[2] > 1:
                out.append(masking.path_str(path))
        return out

    def ratio_list(self, nb_layers: int) -> List[float]:
        if FLAGS.cpg_prune_ratio_type == 'uniform':
            ratios = [FLAGS.cpg_prune_ratio] * nb_layers
            if FLAGS.cpg_skip_ht_layers and nb_layers >= 2:
                ratios[0] = 0.0
                ratios[-1] = 0.0
            return ratios
        if FLAGS.cpg_prune_ratio_type == 'list':
            with open(FLAGS.cpg_prune_ratio_file) as fin:
                text = fin.read().replace('\n', ',')
            ratios = [float(s) for s in text.split(',') if s.strip()]
            if len(ratios) != nb_layers:
                raise ValueError(
                    'cpg_prune_ratio_file has %d ratios but the model has %d '
                    'prunable conv layers' % (len(ratios), nb_layers))
            return ratios
        raise ValueError('unrecognized pruning ratio type: ' + FLAGS.cpg_prune_ratio_type)

    # ------------------------------------------------------------------

    def _build_channel_select_programs(self, paths: List[str]):
        """Jitted programs for the PGD selection + layer reconstruction."""
        model = self.model
        self.helper = self.model_helper
        augment_images = self.dataset_train.augment_images
        path_index = {p: i for i, p in enumerate(paths)}

        # module paths of the prunable kernels, in `paths` order
        module_paths = [p[:-len('/kernel')] for p in paths]

        def relative_adam(lr: float) -> optax.GradientTransformation:
            """Adam direction scaled by lr * per-tensor weight RMS: each step
            is a bounded RELATIVE change, making the reconstruction
            backbone-scale-invariant (works on BN-free nets)."""
            base = optax.scale_by_adam()

            def update(grads, opt_state, params):
                updates, opt_state = base.update(grads, opt_state, params)

                def scale(u, p):
                    rms = jnp.sqrt(jnp.mean(jnp.square(p.astype(jnp.float32))))
                    return (-lr * jnp.maximum(rms, 1e-4)
                            * u.astype(jnp.float32)).astype(u.dtype)

                return jax.tree_util.tree_map(scale, updates, params), opt_state

            return optax.GradientTransformation(base.init, update)

        tx_adam = relative_adam(FLAGS.cpg_lrn_rate_adam)

        def reg_losses_and_grads(fparams, fbstats):
            """Per-layer reg losses [L] (aligned with `paths`) + summed loss."""
            def total_loss(pp, images):
                targets = {p: jax.lax.stop_gradient(a) for p, a in capture_forward(
                    model, {'params': fparams, 'batch_stats': fbstats}, images)}
                outs = dict(capture_forward(
                    model, {'params': pp, 'batch_stats': fbstats}, images,
                    stop_input_grads=True))
                losses = [jnp.sum(jnp.square(outs[p].astype(jnp.float32)
                                             - targets[p].astype(jnp.float32))) * 0.5
                          for p in module_paths]
                return sum(losses), jnp.stack(losses)
            return total_loss

        @jax.jit
        def pgd_step(fparams, fbstats, pruned, lrn_rates, percentiles, batch):
            images = augment_images(batch, jax.random.PRNGKey(0), False)
            loss_fn = reg_losses_and_grads(fparams, fbstats)
            grads, losses = jax.grad(lambda pp: loss_fn(pp, images),
                                     has_aux=True)(pruned)

            def upd(path, p, g):
                pstr = masking.path_str(path)
                idx = path_index.get(pstr)
                if idx is None:
                    return p
                # RELATIVE normalized step (like the reconstruction's
                # relative_adam): the reg loss is a SUM of squared feature
                # errors, so raw gradient magnitude scales with feature-map
                # size and activation scale — an absolute `p - lr*g` step
                # that converges on ResNet-20@32x32 NaNs a trained
                # VGG-SSD@64x64 in a few adaptive-lr increases.  lrn_rates
                # become dimensionless fractions of the weight RMS.
                p32 = p.astype(jnp.float32)
                g32 = g.astype(jnp.float32)
                g_rms = jnp.sqrt(jnp.mean(jnp.square(g32))) + 1e-20
                p_rms = jnp.maximum(
                    jnp.sqrt(jnp.mean(jnp.square(p32))), 1e-8)
                w_new = p32 - lrn_rates[idx] * p_rms * (g32 / g_rms)
                # overshoot guard: a non-finite update keeps the old weights
                # (the adaptive rule then decays this layer's lr; without
                # the guard NaN params are unrecoverable)
                w_new = jnp.where(jnp.isfinite(w_new), w_new, p32)
                return group_lasso_shrink(w_new, percentiles[idx]).astype(p.dtype)

            pruned = jax.tree_util.tree_map_with_path(upd, pruned, grads)
            return pruned, losses

        @jax.jit
        def masks_of(pruned):
            """Channel masks [1,1,I,1] from surviving (nonzero) channels."""
            def mk(path, p):
                if masking.path_str(path) in path_index:
                    return (channel_norms(p) > 0).astype(jnp.float32)
                return jnp.ones((), jnp.float32)
            return jax.tree_util.tree_map_with_path(mk, pruned)

        @jax.jit
        def recon_init(pruned):
            return tx_adam.init(pruned)

        @jax.jit
        def recon_step(fparams, fbstats, pruned, masks, opt_state, batch):
            """Layer reconstruction on surviving channels (Adam, :385-392)."""
            images = augment_images(batch, jax.random.PRNGKey(0), False)
            loss_fn = reg_losses_and_grads(fparams, fbstats)
            grads, losses = jax.grad(lambda pp: loss_fn(pp, images),
                                     has_aux=True)(pruned)
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g, m: g * m.astype(g.dtype)
                if masking.path_str(path) in path_index else jnp.zeros_like(g),
                grads, masks)
            updates, opt_state = tx_adam.update(grads, opt_state, pruned)
            return optax.apply_updates(pruned, updates), opt_state, losses

        return pgd_step, masks_of, recon_init, recon_step

    def choose_channels(self, state: TrainState) -> Tuple[TrainState, dict]:
        """PGD channel selection + reconstruction; returns (state, masks)."""
        paths = self.prunable_paths(state.params)
        ratios = self.ratio_list(len(paths))
        pgd_step, masks_of, recon_init, recon_step = \
            self._build_channel_select_programs(paths)
        train_iter = self.dataset_train.build()
        nb_iters = max(1, FLAGS.cpg_nb_iters_layer // self.nb_workers)

        fparams, fbstats = state.params, state.batch_stats
        pruned = self.copy_state(state).params
        lrn_rates = np.full(len(paths), FLAGS.cpg_lrn_rate_pgd_init, np.float32)
        # +inf: the adaptive rule must see a REAL previous loss before it
        # decays (zeros would trigger a spurious 0.7x cut on iteration 1)
        losses_prev = np.full(len(paths), np.inf, np.float32)
        target = np.asarray(ratios, np.float32) * 100.0

        for idx_iter in range(nb_iters):
            percentiles = target * (idx_iter + 1) / nb_iters
            pruned, losses = pgd_step(fparams, fbstats, pruned,
                                      jnp.asarray(lrn_rates),
                                      jnp.asarray(percentiles), next(train_iter))
            losses = np.asarray(jax.device_get(losses))
            # adaptive per-layer lr (reference :490-495)
            lrn_rates = np.where(losses < losses_prev,
                                 lrn_rates * FLAGS.cpg_lrn_rate_pgd_incr,
                                 lrn_rates * FLAGS.cpg_lrn_rate_pgd_decr)
            losses_prev = losses
            if (idx_iter + 1) % max(1, nb_iters // 4) == 0:
                self.log.info('PGD iter %d/%d: reg losses %s',
                              idx_iter + 1, nb_iters, np.round(losses, 3).tolist())

        masks = masks_of(pruned)
        # reset survivors to the ORIGINAL weights before reconstruction: the
        # group-LASSO shrinkage is a selection device (it scaled every
        # surviving channel toward zero while annealing the threshold), not a
        # reconstruction start — on a BN-free net the shrunk weights leave
        # per-layer outputs orders of magnitude off and the bounded
        # relative-Adam reconstruction cannot climb back.  The reference's
        # fake-pruning does the same: pruned channels zeroed, survivors
        # untouched (channel_pruner.py:665-725).
        pruned = jax.jit(masking.apply_masks)(
            self.copy_state(state).params, masks)
        opt_state = recon_init(pruned)
        for _ in range(nb_iters):
            pruned, opt_state, losses = recon_step(
                fparams, fbstats, pruned, masks, opt_state, next(train_iter))
        self.log.info('reconstruction done: reg losses %s',
                      np.round(np.asarray(jax.device_get(losses)), 3).tolist())
        # freeze pruned channels exactly at zero after reconstruction
        pruned = jax.jit(masking.apply_masks)(pruned, masks)
        if jax.process_count() > 1:
            # PGD losses (hence adaptive lrn_rates, shrinkage, selections)
            # came from each process's own data shard: broadcast the
            # primary's result before treating it as replicated, like the
            # other selection learners
            from pocketflow_tpu.core import mesh as mesh_lib
            pruned = jax.tree_util.tree_map(
                lambda a: mesh_lib.broadcast_from_primary(jnp.asarray(a)),
                jax.device_get(pruned))
            masks = jax.tree_util.tree_map(
                lambda a: mesh_lib.broadcast_from_primary(jnp.asarray(a)),
                jax.device_get(masks))
        state = self.set_extra(state.replace(params=pruned), {'masks': masks})
        return state, state.extra['masks']

    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        state, tx, _ = self.init_state()
        state, _ = self.restore_baseline(state)
        state, masks = self.choose_channels(state)

        def grad_transform(grads, state):
            return masking.mask_gradients(grads, state.extra['masks'])

        def post_update(state):  # keep pruned channels exactly zero
            return state.replace(params=masking.apply_masks(
                state.params, state.extra['masks']))

        loss_extra = self.helper_dst.loss_extra_fn() if self.helper_dst else None
        train_step = self.build_train_step(
            tx, loss_extra_fn=loss_extra,
            grad_transform_fn=grad_transform, post_update_fn=post_update)
        eval_step = self.build_pruned_eval_step()
        state = self.run_train_loop(
            state, train_step, save_path=FLAGS.cpg_save_path,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        self.run_eval_loop(state, eval_step)
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state()
        extra = {'masks': jax.jit(lambda p: jax.tree_util.tree_map_with_path(
            lambda path, l: jnp.ones((1, 1, l.shape[2], 1), jnp.float32)
            if masking.is_maskable_path(path) and l.ndim == 4 and l.shape[2] > 1
            else jnp.ones((), jnp.float32), p))(state.params)}
        # set_extra keeps the TP sharding contract (raw replace desyncs
        # _state_sharding.extra from the state fed into the eval jit)
        state = self.set_extra(state, extra)
        restored = self.restore_model(state, FLAGS.cpg_save_path)
        if restored is None:
            raise FileNotFoundError('no checkpoint found under ' + FLAGS.cpg_save_path)
        return self.run_eval_loop(restored, self.build_pruned_eval_step())

    def build_pruned_eval_step(self):
        helper = self.model_helper
        model = self.model
        augment_xy = self.dataset_eval.augment_xy

        def step_fn(state: TrainState, batch):
            images, labels = augment_xy(batch, jax.random.PRNGKey(0), False)
            variables = {'params': state.params, 'batch_stats': state.batch_stats}
            outputs = helper.forward_eval(model, variables, images)
            loss, metrics = helper.calc_loss(labels, outputs, state.params)
            return {'loss': loss,
                    'pr_trn': masking.calc_prune_ratio(state.params),
                    **metrics}

        state_sharding = self._state_sharding or self.repl_sharding
        return jax.jit(
            step_fn,
            in_shardings=(state_sharding, self.batch_sharding),
            out_shardings=self.repl_sharding)
