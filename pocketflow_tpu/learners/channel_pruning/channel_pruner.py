"""Channel pruner: LASSO channel selection + least-squares reconstruction.

Rebuild of /root/reference/learners/channel_pruning/channel_pruner.py:52-807
(He et al. ICCV'17), re-designed for TPU:

* feature-map sampling (reference :263-341: 10 points/image x 30 batches via
  `tf.extract_image_patches`) is a jitted program using
  `lax.conv_general_dilated_patches` + random gathers — patches never leave
  the device unsampled;
* channel selection (reference :456-577: binary-search LassoLars alpha from
  sklearn) becomes a **jitted ISTA solver** for
  min_beta 1/2 ||y - P beta||^2 + alpha ||beta||_1 with the same
  alpha-binary-search-to-hit-channel-count outer loop (incl. the
  multiple-of-4 'quadruple' option) on the host;
* W2 reconstruction (reference :442-454: sklearn LinearRegression) is
  `jnp.linalg.lstsq` on the surviving channels;
* "fake pruning" (reference :665-725: zeroing pruned channels in-place)
  becomes input-channel masks applied to the kernel pytree.

Residual-specific graph introspection (fathers/children/W1-pruning,
reference model_wrapper.py:31-369) is deliberately NOT replicated: masking
input channels of each conv is function-preserving for any topology, and the
export tool shrinks kernels physically where the topology allows.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core.metrics import get_logger
from pocketflow_tpu.learners.capture import CapturePolicy
from pocketflow_tpu.learners.weight_sparsification import masking
from pocketflow_tpu.nn.layers import compression

FLAGS.DEFINE_integer('cp_nb_points_per_layer', 10,
                     'CP: sampled positions per image per layer')
FLAGS.DEFINE_integer('cp_nb_batches', 30, 'CP: batches sampled for reconstruction')
FLAGS.DEFINE_boolean('cp_quadruple', False,
                     'CP: force surviving channel counts to multiples of 4')
FLAGS.DEFINE_integer('cp_lasso_nb_iters', 300,
                     'CP: ISTA iterations per LASSO solve (tests/smoke runs '
                     'can lower this)')
FLAGS.DEFINE_boolean('cp_lasso', True,
                     'CP: use LASSO selection + reconstruction; if False, '
                     'prune by kernel weight magnitude (reference '
                     'channel_pruner.py:33-36,619-630)')


class InputCapturePolicy(CapturePolicy):
    """Also records conv *inputs* (needed for patch extraction)."""

    def __init__(self):
        super().__init__()
        self.inputs: List[Tuple[str, jax.Array]] = []

    def reset_trace(self):
        super().reset_trace()
        self.inputs = []

    def process_input(self, path, x):
        self.inputs.append((path, x))
        return x


def conv_layer_specs(model, params, batch_stats, sample_images):
    """Static per-conv specs via one abstract trace: path, kernel shape,
    strides, padding, input/output shapes, FLOPs."""
    recorder = InputCapturePolicy()

    def fwd(v, x):
        with compression(recorder):
            model.apply(v, x, train=False)
        return ()

    jax.eval_shape(fwd, {'params': params, 'batch_stats': batch_stats},
                   jax.ShapeDtypeStruct(sample_images.shape, jnp.float32))
    flat = {masking.path_str(p): leaf for p, leaf
            in jax.tree_util.tree_leaves_with_path(params)}
    ins = dict(recorder.inputs)
    specs = []
    for path, out in recorder.captured:
        kernel = flat.get(path + '/kernel')
        if kernel is None or kernel.ndim != 4:
            continue
        x = ins[path]
        h, w, c_in, c_out = kernel.shape
        if c_in == 1 and x.shape[-1] != 1:
            continue  # depthwise conv: input channels not prunable this way
        stride_h = max(1, int(round((x.shape[1]) / out.shape[1])))
        # infer the conv's padding from the captured shapes: patch
        # extraction must use the SAME padding as the conv or every
        # (X, Y) regression pair is spatially misaligned
        same_out = -(-x.shape[1] // stride_h)
        valid_out = -(-(x.shape[1] - h + 1) // stride_h)
        padding = 'SAME' if out.shape[1] == same_out else 'VALID'
        if out.shape[1] not in (same_out, valid_out):
            get_logger().warning(
                'conv %s: output height %d matches neither SAME (%d) nor '
                'VALID (%d); assuming SAME', path, out.shape[1], same_out,
                valid_out)
        flops = 2.0 * out.shape[1] * out.shape[2] * h * w * c_in * c_out
        specs.append({
            'path': path, 'kernel_shape': (h, w, c_in, c_out),
            'strides': (stride_h, stride_h), 'padding': padding,
            'in_shape': tuple(x.shape), 'out_shape': tuple(out.shape),
            'flops': float(flops),
        })
    return specs


# ---------------------------------------------------------------------------
# jitted ISTA LASSO (replaces sklearn LassoLars, reference :482-490)
# ---------------------------------------------------------------------------

def make_lasso_solver(nb_iters: Optional[int] = None):
    if nb_iters is None:
        nb_iters = int(FLAGS.cp_lasso_nb_iters)
    @jax.jit
    def solve(P, y, alpha):
        """min 1/2||y - P b||^2 + alpha*||b||_1 via ISTA; returns beta."""
        P32 = P.astype(jnp.float32)
        y32 = y.astype(jnp.float32)
        # Lipschitz bound via 8 power iterations on P^T P
        v = jnp.ones((P32.shape[1],), jnp.float32)
        def power(v, _):
            v = P32.T @ (P32 @ v)
            return v / (jnp.linalg.norm(v) + 1e-12), None
        v, _ = jax.lax.scan(power, v / jnp.linalg.norm(v), None, length=8)
        lip = jnp.linalg.norm(P32 @ v) ** 2 + 1e-6
        step = 1.0 / lip
        Pty = P32.T @ y32

        def body(beta, _):
            grad = P32.T @ (P32 @ beta) - Pty
            beta = beta - step * grad
            beta = jnp.sign(beta) * jnp.maximum(jnp.abs(beta) - step * alpha, 0.0)
            return beta, None

        beta, _ = jax.lax.scan(body, jnp.zeros((P32.shape[1],), jnp.float32),
                               None, length=nb_iters)
        return beta
    return solve


def select_channels(P: np.ndarray, y: np.ndarray, c_new: int,
                    solver, alpha_init: float = 1e-4,
                    tolerance: float = 0.02) -> np.ndarray:
    """Binary-search alpha until ~c_new nonzero channels survive
    (reference compute_pruned_kernel :497-568, incl. 'quadruple')."""
    log = get_logger()
    c_in = P.shape[1]
    if c_new >= c_in:
        return np.ones(c_in, bool)
    P_dev, y_dev = jnp.asarray(P), jnp.asarray(y)

    def nnz(alpha):
        beta = np.asarray(jax.device_get(solver(P_dev, y_dev, jnp.float32(alpha))))
        idxs = np.abs(beta) > 1e-12
        return idxs, int(idxs.sum())

    left, right = 0.0, alpha_init
    lbound = c_new - tolerance * c_in / 2
    rbound = c_new + tolerance * c_in / 2
    # grow right until it over-prunes
    for _ in range(60):
        _, count = nnz(right)
        if count < c_new:
            break
        right *= 2
    alpha = (left + right) / 2
    idxs, count = nnz(alpha)
    for _ in range(60):
        if FLAGS.cp_quadruple and count % 4 == 0 and abs(count - c_new) <= 2:
            break
        if lbound <= count <= rbound:
            if not FLAGS.cp_quadruple or count % 4 == 0:
                break
            if count % 4 <= 2:
                rbound, lbound = count - 1, lbound - 2
            else:
                lbound, rbound = count + 1, rbound + 2
        elif abs(left - right) <= right * 0.1:
            lbound = max(1, lbound - 1)
            rbound = min(c_in, rbound + 1)
            left, right = left / 1.2, right * 1.2
        elif count > rbound:
            left = left + (alpha - left) / 2
        else:
            right = right - (right - alpha) / 2
        if alpha < 1e-10:
            break
        alpha = (left + right) / 2
        idxs, count = nnz(alpha)
    log.info('lasso: kept %d/%d channels (target %d, alpha %.3e)',
             count, c_in, c_new, alpha)
    if count == 0:
        # degenerate (P^T y ~ 0, e.g. a collapsed upstream layer): the LASSO
        # cannot rank channels, so fall back to magnitude selection at the
        # REQUESTED count — keeping a single channel would over-prune far
        # past the target and silently break the FLOPs budget accounting
        order = np.argsort(-np.abs(P).sum(0))
        idxs = np.zeros(c_in, bool)
        idxs[order[:max(1, c_new)]] = True
    return idxs


# ---------------------------------------------------------------------------
# the pruner
# ---------------------------------------------------------------------------

class ChannelPruner:
    """Samples feature maps, selects channels, reconstructs kernels."""

    def __init__(self, model, dataset, specs):
        self.model = model
        self.dataset = dataset
        self.specs = specs
        self.log = get_logger()
        self.solver = make_lasso_solver()
        self._samplers = {}

    def _sampler(self, spec):
        """Jitted: extract (X patches, Y outputs) at random positions."""
        path = spec['path']
        if path in self._samplers:
            return self._samplers[path]
        model = self.model
        augment_images = self.dataset.augment_images
        h, w, c_in, c_out = spec['kernel_shape']
        strides = spec['strides']
        nb_pts = FLAGS.cp_nb_points_per_layer

        @jax.jit
        def sample(oparams, obstats, cparams, cbstats, batch, rng):
            """X from the CURRENT (partially pruned) net, Y from the
            ORIGINAL net: the reference regresses each layer back toward
            the unpruned model's feature maps (channel_pruner.py:610 reads
            Y from feats_dict extracted once from the original), so
            per-layer pruning error is corrected instead of compounding."""
            images = augment_images(batch, jax.random.PRNGKey(0), False)
            rec_cur = InputCapturePolicy()
            with compression(rec_cur):
                model.apply({'params': cparams, 'batch_stats': cbstats},
                            images, train=False)
            x = dict(rec_cur.inputs)[path]
            rec_orig = InputCapturePolicy()
            with compression(rec_orig):
                model.apply({'params': oparams, 'batch_stats': obstats},
                            images, train=False)
            y_full = dict(rec_orig.captured)[path]
            bias = oparams
            for key in path.split('/'):
                bias = bias[key]
            if 'bias' in bias:
                y_full = y_full - bias['bias'].astype(y_full.dtype)
            # sampled patch windows, gathered DIRECTLY with dynamic slices:
            # materializing conv_general_dilated_patches for the whole map
            # ([B, H', W', c_in*h*w]) costs h*w times the feature-map HBM
            # for ~10 sampled points/image.  Padding MUST match the conv's
            # (inferred in conv_layer_specs) or X and Y index different
            # spatial positions.
            padding = spec.get('padding', 'SAME')
            pads = jax.lax.padtype_to_pads(x.shape[1:3], (h, w), strides,
                                           padding)
            xp = jnp.pad(x.astype(jnp.float32),
                         ((0, 0), pads[0], pads[1], (0, 0)))
            B = x.shape[0]
            Hp = (x.shape[1] + sum(pads[0]) - h) // strides[0] + 1
            Wp = (x.shape[2] + sum(pads[1]) - w) // strides[1] + 1
            k1, k2 = jax.random.split(rng)
            bi = jnp.repeat(jnp.arange(B), nb_pts)
            yi = jax.random.randint(k1, (B * nb_pts,), 0, Hp)
            xi = jax.random.randint(k2, (B * nb_pts,), 0, Wp)

            def window(b, y, xx):
                win = jax.lax.dynamic_slice(
                    xp, (b, y * strides[0], xx * strides[1], 0),
                    (1, h, w, c_in))[0]
                return win.transpose(2, 0, 1)             # (c, kh, kw) order

            X = jax.vmap(window)(bi, yi, xi)              # [P, c_in, h, w]
            Y = y_full[bi, yi, xi].astype(jnp.float32)    # [P, c_out]
            return X, Y

        self._samplers[path] = sample
        return sample

    def collect(self, spec, oparams, obstats, cparams, cbstats, train_iter,
                rng):
        """Host-side accumulation over cp_nb_batches batches.

        ``oparams/obstats`` = the ORIGINAL unpruned net (reconstruction
        targets), ``cparams/cbstats`` = the current partially-pruned net
        (layer inputs)."""
        sample = self._sampler(spec)
        Xs, Ys = [], []
        for i in range(FLAGS.cp_nb_batches):
            X, Y = sample(oparams, obstats, cparams, cbstats,
                          next(train_iter), jax.random.fold_in(rng, i))
            Xs.append(np.asarray(jax.device_get(X)))
            Ys.append(np.asarray(jax.device_get(Y)))
        return np.concatenate(Xs), np.concatenate(Ys)

    def prune_layer(self, spec, kernel: np.ndarray, X: np.ndarray,
                    Y: np.ndarray, preserve_ratio: float):
        """Select input channels + reconstruct the kernel.

        Returns (new_kernel, channel_mask[bool c_in])."""
        h, w, c_in, c_out = spec['kernel_shape']
        c_new = max(1, int(math.ceil(preserve_ratio * c_in)))
        if c_new >= c_in:
            return kernel, np.ones(c_in, bool)

        W2 = np.asarray(kernel, np.float32)               # [h, w, c_in, c_out]
        if FLAGS.cp_lasso:
            # subsample for the lasso like the reference (:467-470)
            nb = X.shape[0]
            rng = np.random.default_rng(FLAGS.rand_seed)
            picks = rng.integers(0, nb, min(400, max(1, nb // 20)))
            Xs, Ys = X[picks], Y[picks]
            # per-channel contribution: P[:, c] = vec(X_c * W2_c) over (pts, c_out)
            # Xs: [p, c_in, h, w]; W2 -> [c_in, h*w, c_out]
            W2c = np.transpose(W2, (2, 0, 1, 3)).reshape(c_in, h * w, c_out)
            Xc = Xs.reshape(Xs.shape[0], c_in, h * w)
            contrib = np.einsum('pck,cko->pco', Xc, W2c)  # [p, c_in, c_out]
            P = contrib.transpose(0, 2, 1).reshape(-1, c_in)  # [p*c_out, c_in]
            yv = Ys.reshape(-1)
            idxs = select_channels(P, yv, c_new, self.solver)
        else:
            # magnitude mode (reference :619-630): keep the c_new input
            # channels with the largest total |W2| mass, then reconstruct
            order = np.argsort(-np.abs(W2).sum((0, 1, 3)))
            idxs = np.zeros(c_in, bool)
            idxs[order[:c_new]] = True

        # least-squares reconstruction on surviving channels (:442-454).
        # Ridge-regularized normal equations instead of raw lstsq: with few
        # sampled rows the system is underdetermined (rows < c_sel*h*w) and
        # the min-norm interpolant generalizes arbitrarily badly — on the SSD
        # strip it reconstructed head kernels whose logits overflowed bf16.
        # lam scales with the data Gram's mean diagonal, so well-conditioned
        # solves are perturbed ~1e-4 relative.
        Xsel = X[:, idxs].reshape(X.shape[0], -1).astype(np.float64)
        Y64 = Y.astype(np.float64)
        gram = Xsel.T @ Xsel
        lam = 1e-4 * max(np.trace(gram) / max(gram.shape[0], 1), 1e-12)
        W2new = np.linalg.solve(gram + lam * np.eye(gram.shape[0]),
                                Xsel.T @ Y64)
        if not np.isfinite(W2new).all():
            # last-resort fallback: keep the original weights on the
            # surviving channels (pure selection, no reconstruction)
            get_logger().warning(
                'layer %s: reconstruction produced non-finite weights; '
                'keeping original kernel values on surviving channels',
                spec['path'])
            new_kernel = np.where(idxs[None, None, :, None], W2, 0.0)
            return jnp.asarray(new_kernel, dtype=kernel.dtype), idxs
        W2new = W2new.reshape(int(idxs.sum()), h, w, c_out)
        new_kernel = np.zeros_like(np.asarray(kernel, np.float32))
        new_kernel[:, :, idxs, :] = np.transpose(W2new, (1, 2, 0, 3))
        return jnp.asarray(new_kernel, dtype=kernel.dtype), idxs
