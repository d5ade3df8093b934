"""Discrimination-aware channel pruning (Zhuang et al., NeurIPS'18).

Rebuild of /root/reference/learners/discr_channel_pruning/learner.py:99-579.

The network's conv layers are split into ``dcp_nb_stages + 1`` blocks; each
block boundary gets an auxiliary classifier head (training-mode BN + ReLU +
global-avg-pool + dense, reference :355-361) whose cross-entropy is the
"discrimination-aware" signal.  Per block:

1. block fine-tune: train the pruned net + aux heads on the block's
   discrimination loss (+ the final loss for the last block), masked grads;
2. greedy channel selection per layer: repeatedly add the input channel with
   the largest gradient norm of (reg loss + block dis loss) w.r.t. the
   kernel, fine-tune the layer briefly, until the layer's pruning ratio
   drops to ``dcp_prune_ratio`` (reference :461-528).

Gradient-norm scoring is done on the *zeroed* weights WITHOUT multiplying the
gradient by the mask — pruned channels must keep their gradient signal so the
argmax can resurrect the most useful one (the reference scores grads of the
var that prune_op zeroed, not mask-multiplied grads).  The original channel
values are kept in a backup tree and restored when a channel is re-added —
the functional analogue of the reference's mask/var_bkup/prune assign chain
(:235-248).

TPU mapping: aux heads are small Flax modules whose params live alongside
the pruned params during selection; channel masks are [1,1,I,1] leaves in
``extra['masks']``; scoring / layer FT / block FT are three jitted programs,
each taking the layer & block as traced one-hot vectors so ONE compilation
serves every layer.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.learners.abstract_learner import AbstractLearner, TrainState
from pocketflow_tpu.learners.capture import CapturePolicy, capture_forward
from pocketflow_tpu.learners.weight_sparsification import masking
from pocketflow_tpu.nn.layers import compression

FLAGS.DEFINE_string('dcp_save_path', './models_dcp/model.ckpt', "DCP: model's save path")
FLAGS.DEFINE_string('dcp_save_path_eval', './models_dcp_eval/model.ckpt',
                    "DCP: model's save path for evaluation")
FLAGS.DEFINE_float('dcp_prune_ratio', 0.5, 'DCP: target channel pruning ratio')
FLAGS.DEFINE_integer('dcp_nb_stages', 3, 'DCP: # of channel pruning stages')
FLAGS.DEFINE_float('dcp_lrn_rate_adam', 1e-3, "DCP: Adam's learning rate")
FLAGS.DEFINE_integer('dcp_nb_iters_block', 10000, 'DCP: # of iterations for block-wise FT')
FLAGS.DEFINE_integer('dcp_nb_iters_layer', 500, 'DCP: # of iterations for layer-wise FT')


class AuxHead(nn.Module):
    """BN(training) + ReLU + GAP + dense classifier (reference :355-361)."""
    nb_classes: int

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        gamma = self.param('gamma', nn.initializers.ones, (x.shape[-1],))
        beta = self.param('beta', nn.initializers.zeros, (x.shape[-1],))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        x = jax.nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.nb_classes, name='fc')(x)


class DisChnPrunedLearner(AbstractLearner):
    """Discrimination-aware channel pruning learner."""

    def __init__(self, sm_writer, model_helper):
        super().__init__(sm_writer, model_helper)
        self.enbl_dst = FLAGS.enbl_dst
        self.helper_dst = None
        if self.enbl_dst:
            from pocketflow_tpu.learners.distillation_helper import DistillationHelper
            self.helper_dst = DistillationHelper(model_helper)
        self.nb_classes = self.dataset_train.spec.nb_classes

    # ------------------------------------------------------------------
    # structure discovery
    # ------------------------------------------------------------------

    def discover_structure(self, params, batch_stats, sample_images):
        """Conv module paths (graph order), block mapping, aux-head sites."""
        recorder = CapturePolicy()

        def fwd(v, x):
            with compression(recorder):
                self.model.apply(v, x, train=False)
            return ()

        jax.eval_shape(fwd, {'params': params, 'batch_stats': batch_stats},
                       jax.ShapeDtypeStruct(sample_images.shape, jnp.float32))
        flat = {masking.path_str(p): leaf for p, leaf
                in jax.tree_util.tree_leaves_with_path(params)}
        conv_paths = []
        for path, _ in recorder.captured:
            kernel = flat.get(path + '/kernel')
            if kernel is not None and kernel.ndim == 4:
                conv_paths.append(path)
        nb_layers = len(conv_paths)
        per_block = int(math.ceil((nb_layers + 1) / (FLAGS.dcp_nb_stages + 1)))
        head_sites = [conv_paths[idx] for idx in range(nb_layers)
                      if (idx + 1) % per_block == 0]
        # block index = number of head sites strictly before the layer: the
        # ACTUAL head count defines the blocks (the reference sets nb_blocks
        # from len(dis_losses), learner.py:253-255) — dcp_nb_stages+1 can
        # exceed it on misaligned layer counts, leaving trailing blocks with
        # layers but no loss
        boundaries = [idx for idx in range(nb_layers)
                      if (idx + 1) % per_block == 0]
        layer_to_block = [sum(1 for b in boundaries if idx > b)
                          for idx in range(nb_layers)]
        return conv_paths, layer_to_block, head_sites

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _build_programs(self, conv_paths, head_sites):
        model = self.model
        helper = self.model_helper
        augment_xy = self.dataset_train.augment_xy
        augment_images = self.dataset_train.augment_images
        nb_blocks = len(head_sites) + 1  # actual heads + the final block
        heads = {site: AuxHead(self.nb_classes) for site in head_sites}
        tx = optax.adam(FLAGS.dcp_lrn_rate_adam)
        ce = helper.softmax_cross_entropy

        def losses(pruned, aux, fparams, fbstats, images, labels):
            """(reg_losses [L], dis_losses [nb_heads], final_loss)."""
            from pocketflow_tpu.learners.capture import (
                capture_forward_with_output)
            targets = dict(capture_forward(
                model, {'params': fparams, 'batch_stats': fbstats}, images))
            # ONE forward of the pruned net serves both the captured
            # activations and the final logits (a separate model.apply was a
            # third full forward+backward that XLA could not eliminate)
            captured, final_logits = capture_forward_with_output(
                model, {'params': pruned, 'batch_stats': fbstats}, images)
            outs = dict(captured)
            reg = [jnp.sum(jnp.square(outs[p].astype(jnp.float32)
                                      - jax.lax.stop_gradient(targets[p])
                                      .astype(jnp.float32))) * 0.5
                   for p in conv_paths]
            dis = [ce(labels, heads[site].apply({'params': aux[site]}, outs[site]))
                   for site in head_sites]
            final = ce(labels, final_logits)
            return reg, dis, final

        def selection_loss(pruned, aux, fparams, fbstats, images, labels,
                           layer_onehot, block_onehot):
            reg, dis, final = losses(pruned, aux, fparams, fbstats, images, labels)
            layer_reg = sum(layer_onehot[i] * reg[i] for i in range(len(reg)))
            blk = sum(block_onehot[i] * d for i, d in enumerate(dis))
            blk = blk + block_onehot[nb_blocks - 1] * final
            return layer_reg + blk

        @jax.jit
        def init_aux(fparams, fbstats, batch, rng):
            images = augment_images(batch, jax.random.PRNGKey(0), False)
            acts = dict(capture_forward(
                model, {'params': fparams, 'batch_stats': fbstats}, images))
            return {site: heads[site].init(jax.random.fold_in(rng, i),
                                           acts[site])['params']
                    for i, site in enumerate(head_sites)}

        @jax.jit
        def opt_init(pruned, aux):
            return tx.init((pruned, aux))

        @jax.jit
        def block_ft_step(fparams, fbstats, pruned, aux, masks, opt_state,
                          batch, block_onehot):
            images, labels = augment_xy(batch, jax.random.PRNGKey(0), True)

            def loss_fn(pp, ax):
                reg, dis, final = losses(pp, ax, fparams, fbstats, images, labels)
                blk = sum(block_onehot[i] * d for i, d in enumerate(dis))
                # the reference trains EVERY block on dis_loss + the final
                # task loss (learner.py __build_block_ops: loss_all =
                # dis_loss + dis_losses[-1]) — layers downstream of the
                # block's head must keep receiving task gradient
                return blk + block_onehot[nb_blocks - 1] * final + final

            g_p, g_a = jax.grad(loss_fn, argnums=(0, 1))(pruned, aux)
            g_p = masking.mask_gradients(g_p, masks)
            updates, opt_state = tx.update((g_p, g_a), opt_state, (pruned, aux))
            pruned, aux = optax.apply_updates((pruned, aux), updates)
            return pruned, aux, opt_state

        @jax.jit
        def grad_norm_step(fparams, fbstats, pruned, aux, batch,
                           layer_onehot, block_onehot):
            """Per-input-channel gradient norms of the selection loss for the
            one-hot-selected layer — UNMASKED grads at the zeroed weights."""
            images, labels = augment_xy(batch, jax.random.PRNGKey(0), False)
            grads = jax.grad(selection_loss)(
                pruned, aux, fparams, fbstats, images, labels,
                layer_onehot, block_onehot)
            norms = []
            for path in conv_paths:
                g = grads
                for key in path.split('/') + ['kernel']:
                    g = g[key]
                norms.append(jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)),
                                              axis=(0, 1, 3))))
            max_c = max(n.shape[0] for n in norms)
            padded = jnp.stack([jnp.pad(n, (0, max_c - n.shape[0])) for n in norms])
            return jnp.einsum('l,lc->c', layer_onehot, padded)

        @jax.jit
        def layer_ft_step(fparams, fbstats, pruned, aux, masks, opt_state,
                          batch, layer_onehot, block_onehot):
            images, labels = augment_xy(batch, jax.random.PRNGKey(0), True)
            grads = jax.grad(selection_loss)(
                pruned, aux, fparams, fbstats, images, labels,
                layer_onehot, block_onehot)
            grads = masking.mask_gradients(grads, masks)

            def keep(path, g):  # only the selected layer's kernel trains
                pstr = masking.path_str(path)
                for i, cpath in enumerate(conv_paths):
                    if pstr == cpath + '/kernel':
                        return g * layer_onehot[i]
                return jnp.zeros_like(g)

            grads = jax.tree_util.tree_map_with_path(keep, grads)
            updates, opt_state = tx.update(grads, opt_state, pruned)
            return optax.apply_updates(pruned, updates), opt_state

        @jax.jit
        def layer_opt_init(pruned):
            return tx.init(pruned)

        @jax.jit
        def merge_bkup(pruned, bkup, masks_old, masks_new):
            """bkup <- where(OLD mask>0, pruned, bkup);
            pruned <- bkup * NEW mask (the reference's var_bkup/prune chain).

            The backup must be refreshed from the channels that were LIVE
            under the old mask and the restore read under the new mask —
            updating the backup with the new mask would copy the zeroed
            values of a just-added channel over its saved weights, so every
            re-added channel restarted at exactly zero."""
            def upd(path, p, b, m_old, m_new):
                if not masking.is_maskable_path(path):
                    return p, b
                b = jnp.where(m_old > 0.5, p.astype(jnp.float32), b)
                return (b * m_new).astype(p.dtype), b
            pairs = jax.tree_util.tree_map_with_path(upd, pruned, bkup,
                                                     masks_old, masks_new)
            treedef = jax.tree_util.tree_structure(pruned)
            leaves = treedef.flatten_up_to(pairs)
            return (treedef.unflatten([t[0] for t in leaves]),
                    treedef.unflatten([t[1] for t in leaves]))

        return {'init_aux': init_aux, 'opt_init': opt_init,
                'block_ft': block_ft_step, 'grad_norm': grad_norm_step,
                'layer_ft': layer_ft_step, 'layer_opt_init': layer_opt_init,
                'merge_bkup': merge_bkup}

    # ------------------------------------------------------------------
    # channel selection (reference __choose_discr_chns, :461-528)
    # ------------------------------------------------------------------

    def choose_discr_chns(self, state: TrainState) -> TrainState:
        sample = self.dataset_train.peek_batch(2)  # no pipeline leak
        sample_images = self.dataset_train.augment_images(
            {k: jnp.asarray(v) for k, v in sample.items()},
            jax.random.PRNGKey(0), False)
        conv_paths, layer_to_block, head_sites = self.discover_structure(
            state.params, state.batch_stats, sample_images)
        programs = self._build_programs(conv_paths, head_sites)
        nb_blocks = int(FLAGS.dcp_nb_stages + 1)
        nb_layers = len(conv_paths)

        fparams, fbstats = state.params, state.batch_stats
        pruned = self.copy_state(state).params
        bkup = self.copy_state(state).params
        train_iter = self.dataset_train.build()

        flat = {masking.path_str(p): leaf for p, leaf
                in jax.tree_util.tree_leaves_with_path(pruned)}
        chn_counts = {p: flat[p + '/kernel'].shape[2] for p in conv_paths}
        host_masks = {p: np.ones(chn_counts[p], np.float32) for p in conv_paths}

        def device_masks():
            def mk(path, leaf):
                pstr = masking.path_str(path)
                for cpath in conv_paths:
                    if pstr == cpath + '/kernel':
                        return jnp.asarray(host_masks[cpath].reshape(1, 1, -1, 1))
                return jnp.ones((), jnp.float32)
            return jax.tree_util.tree_map_with_path(mk, pruned)

        aux = programs['init_aux'](fparams, fbstats, next(train_iter),
                                   self.next_rng())
        nb_iters_block = max(1, FLAGS.dcp_nb_iters_block // self.nb_workers)
        nb_iters_layer = max(1, FLAGS.dcp_nb_iters_layer // self.nb_workers)

        for idx_block in range(nb_blocks):
            block_onehot = jnp.zeros(nb_blocks).at[idx_block].set(1.0)
            masks = device_masks()
            opt_state = programs['opt_init'](pruned, aux)
            for _ in range(nb_iters_block):
                pruned, aux, opt_state = programs['block_ft'](
                    fparams, fbstats, pruned, aux, masks, opt_state,
                    next(train_iter), block_onehot)

            for idx_layer in range(1, nb_layers):  # never prune the first layer
                if layer_to_block[idx_layer] != idx_block:
                    continue
                path = conv_paths[idx_layer]
                nb_chns = chn_counts[path]
                layer_onehot = jnp.zeros(nb_layers).at[idx_layer].set(1.0)
                masks_before = device_masks()  # layer still fully live
                host_masks[path] = np.zeros(nb_chns, np.float32)
                grad_norm_mask = np.ones(nb_chns)
                # save the layer's block-FT weights into the backup (old
                # mask = all-ones), then zero it (new mask)
                masks = device_masks()
                pruned, bkup = programs['merge_bkup'](pruned, bkup,
                                                      masks_before, masks)
                layer_opt = programs['layer_opt_init'](pruned)
                prune_ratio = 1.0
                while prune_ratio > FLAGS.dcp_prune_ratio:
                    norms = np.asarray(jax.device_get(programs['grad_norm'](
                        fparams, fbstats, pruned, aux,
                        next(train_iter), layer_onehot, block_onehot)))[:nb_chns]
                    idx_chn = int(np.argmax((norms + 1e-8) * grad_norm_mask))
                    masks_old = masks
                    host_masks[path][idx_chn] = 1.0
                    grad_norm_mask[idx_chn] = 0.0
                    masks = device_masks()
                    # restore the newly added channel's weights from backup
                    # (backup refresh reads the OLD mask so the zeroed value
                    # of the added channel cannot clobber its saved weights)
                    pruned, bkup = programs['merge_bkup'](pruned, bkup,
                                                          masks_old, masks)
                    for _ in range(nb_iters_layer):
                        pruned, layer_opt = programs['layer_ft'](
                            fparams, fbstats, pruned, aux, masks, layer_opt,
                            next(train_iter), layer_onehot, block_onehot)
                    prune_ratio = 1.0 - float(np.count_nonzero(
                        host_masks[path])) / nb_chns
                self.log.info('layer %s: prune_ratio = %.4f', path, prune_ratio)

        if jax.process_count() > 1:
            # per-process data shards drove per-host argmax channel choices:
            # broadcast the primary's selection like the CP/WS/UQ searches
            from pocketflow_tpu.core import mesh as mesh_lib
            host_p = jax.device_get(pruned)
            pruned = jax.tree_util.tree_map(
                lambda a: mesh_lib.broadcast_from_primary(jnp.asarray(a)),
                host_p)
            for key in host_masks:
                host_masks[key] = np.asarray(jax.device_get(
                    mesh_lib.broadcast_from_primary(
                        jnp.asarray(host_masks[key]))))
        masks = device_masks()
        pruned = jax.jit(masking.apply_masks)(pruned, masks)
        return self.set_extra(state.replace(params=pruned), {'masks': masks})

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def train(self) -> TrainState:
        # greedy per-layer channel selection runs one-hot-traced layer
        # programs with host-side mask surgery — DP-only (see require_dp_only)
        self.require_dp_only('the greedy channel-selection phase')
        state, tx, _ = self.init_state()
        state, _ = self.restore_baseline(state)
        state = self.choose_discr_chns(state)

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
            state, train_step, save_path=FLAGS.dcp_save_path,
            eval_fn=lambda s: self.run_eval_loop(s, eval_step))
        self.run_eval_loop(state, eval_step)
        return state

    def evaluate(self) -> Dict[str, float]:
        state, _, _ = self.init_state()
        sample = self.dataset_train.peek_batch(2)  # no pipeline leak
        sample_images = self.dataset_train.augment_images(
            {k: jnp.asarray(v) for k, v in sample.items()},
            jax.random.PRNGKey(0), False)
        conv_paths, _, _ = self.discover_structure(
            state.params, state.batch_stats, sample_images)

        def mk(path, leaf):
            pstr = masking.path_str(path)
            for cpath in conv_paths:
                if pstr == cpath + '/kernel':
                    return jnp.ones((1, 1, leaf.shape[2], 1), jnp.float32)
            return jnp.ones((), jnp.float32)

        masks = jax.tree_util.tree_map_with_path(mk, state.params)
        # set_extra keeps the TP sharding contract (raw replace desyncs
        # _state_sharding.extra from the state fed into the eval jit)
        state = self.set_extra(state, {'masks': masks})
        restored = self.restore_model(state, FLAGS.dcp_save_path)
        if restored is None:
            raise FileNotFoundError('no checkpoint found under ' + FLAGS.dcp_save_path)
        return self.run_eval_loop(restored, self.build_eval_step())
