"""Abstract learner: lifecycle + the shared jitted train/eval machinery.

Rebuild of /root/reference/learners/abstract_learner.py:41-158.  The reference
learner builds *two TF graphs* (train + eval) with separate sessions and moves
weights between them through checkpoint round-trips; every concrete learner
re-implements a sess.run train loop.  Here the state is one explicit pytree
(`TrainState`) and both modes are pure functions of it, so the whole train
step — forward, compression policy, loss, backward, all-reduce, update —
compiles to a single XLA program (`jit` over the global mesh, batch sharded on
the "data" axis, params replicated; XLA inserts the gradient psum that Horovod's
DistributedOptimizer used to do in C++).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from pocketflow_tpu.config import FLAGS
from pocketflow_tpu.core import checkpoint as ckpt_lib
from pocketflow_tpu.core import mesh as mesh_lib
from pocketflow_tpu.core.metrics import ProgressMonitor, SummaryWriter, get_logger
from pocketflow_tpu.nn.layers import CompressionPolicy


@struct.dataclass
class TrainState:
    """The whole training state as one pytree (replicated across the mesh)."""
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    extra: Any = None  # learner-specific state (masks, quant scales, codebooks…)


class AbstractLearner(ABC):
    """Lifecycle (`train` / `evaluate`) + shared functional train-loop pieces."""

    def __init__(self, sm_writer: Optional[SummaryWriter], model_helper):
        self.sm_writer = sm_writer
        self.model_helper = model_helper
        self.log = get_logger()

        mesh_lib.distributed_init()
        self.mesh = mesh_lib.global_mesh()

        # function interface provided by the model helper (reference :76-88)
        self.build_dataset_train = model_helper.build_dataset_train
        self.build_dataset_eval = model_helper.build_dataset_eval
        self.forward_train = model_helper.forward_train
        self.forward_eval = model_helper.forward_eval
        self.calc_loss = model_helper.calc_loss
        self.setup_lrn_rate = model_helper.setup_lrn_rate
        self.warm_start = model_helper.warm_start
        self.dump_n_eval = model_helper.dump_n_eval
        self.model_name = model_helper.model_name
        self.dataset_name = model_helper.dataset_name
        self.forward_w_labels = model_helper.forward_w_labels

        self.ckpt_file = 'models_%s_at_%s.tar.gz' % (self.model_name, self.dataset_name)

        # datasets & batch geometry
        self.dataset_train = self.build_dataset_train()
        self.dataset_eval = self.build_dataset_eval()
        data_size = self.mesh.shape.get(mesh_lib.DATA_AXIS, 1)
        self.nb_workers = data_size
        self.local_data_devices = max(1, data_size // jax.process_count())
        # per-chip batch from the dataset spec; host batch feeds all local chips
        self.batch_size_per_chip = self.dataset_train.spec.batch_size
        self.global_batch_size = self.batch_size_per_chip * data_size
        self.dataset_train.batch_size = self.batch_size_per_chip * self.local_data_devices
        # eval runs replicated-form on the same mesh
        self.dataset_eval.batch_size = (
            self.dataset_eval.spec.batch_size_eval * self.local_data_devices)

        self.model = model_helper.create_model()
        self._rng = jax.random.PRNGKey(FLAGS.rand_seed)

        # shardings
        self.repl_sharding = NamedSharding(self.mesh, P())
        self.batch_sharding = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))
        # tensor parallelism: large kernels shard their last axis over the
        # 'model' mesh axis (new in the rebuild; the reference is DP-only)
        self.enbl_tp = (FLAGS.get('enbl_tensor_parallel', False)
                        and self.mesh.shape.get(mesh_lib.MODEL_AXIS, 1) > 1)
        self._state_sharding = None  # set by init_state under TP

    def require_dp_only(self, phase: str):
        """Fail LOUDLY if a host-surgery search phase runs under tensor
        parallelism.  These phases mix host-side kernel/mask surgery,
        replicated device_puts, and mid-search set_extra mutations that do
        not honor a TP sharding tree — the silent failure mode is a hang or
        wrong numerics, so every such learner must call this up front and
        tell the user the supported recipe (search data-parallel, then
        fine-tune the resulting checkpoint under TP)."""
        if self.enbl_tp:
            raise NotImplementedError(
                '%s does not support tensor parallelism during %s; run with '
                '--mesh_model_parallel=1 and fine-tune the resulting '
                'checkpoint under TP' % (type(self).__name__, phase))

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    @abstractmethod
    def train(self):
        """Train a model and periodically produce checkpoint files."""

    @abstractmethod
    def evaluate(self):
        """Restore from the latest checkpoint and measure eval performance."""

    # ------------------------------------------------------------------
    # shared helpers (used by every concrete learner)
    # ------------------------------------------------------------------

    def next_rng(self) -> jax.Array:
        self._rng, key = jax.random.split(self._rng)
        return key

    def init_state(self, extra: Any = None) -> Tuple[TrainState, optax.GradientTransformation, Any]:
        """Initialize variables + optimizer; returns (state, tx, lr_schedule).

        The entire init (augment sample -> model.init -> tx.init) runs as ONE
        jitted program: eager init dispatches thousands of tiny ops, which is
        pathological when every op triggers a remote compile (axon tunnel).
        """
        # shape/dtype peek only — build() would leak a prefetch pipeline
        sample = self.dataset_train.peek_images(2)
        schedule, self.nb_iters_train = self.setup_lrn_rate(self.global_batch_size)
        tx = optax.sgd(learning_rate=schedule, momentum=FLAGS.momentum)
        model = self.model
        augment = self.dataset_train.augment

        def init_fn(rng, raw_sample):
            x = augment(raw_sample, jax.random.PRNGKey(0), False)
            variables = model.init(rng, x, train=False)
            params = variables['params']
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=dict(variables.get('batch_stats', {})),
                opt_state=tx.init(params),
                extra=extra)

        if self.enbl_tp:
            # shapes only — use a dummy key so the rng STREAM matches DP runs
            skeleton = jax.eval_shape(init_fn, jax.random.PRNGKey(0),
                                      jax.ShapeDtypeStruct(
                                          jnp.asarray(sample).shape, jnp.uint8))
            self._state_sharding = mesh_lib.infer_tp_sharding(skeleton, self.mesh)
        state_sharding = self._state_sharding or self.repl_sharding
        state = jax.jit(init_fn, out_shardings=state_sharding)(
            self.next_rng(), jnp.asarray(sample))
        return state, tx, schedule

    def build_train_step(self, tx: optax.GradientTransformation,
                         policy_fn: Optional[Callable[[Any], Optional[CompressionPolicy]]] = None,
                         loss_extra_fn: Optional[Callable] = None,
                         grad_transform_fn: Optional[Callable] = None,
                         post_update_fn: Optional[Callable] = None):
        """Build the fused jitted train step.

        * policy_fn(extra)        -> CompressionPolicy for this step (or None)
        * loss_extra_fn(state, outputs, images, labels) -> (extra_loss, extra_metrics)
          (distillation, discrimination-aware heads, ...)
        * grad_transform_fn(grads, extra) -> grads  (masked gradients)
        * post_update_fn(state)   -> state          (mask refresh, schedules)
        """
        helper = self.model_helper
        model = self.model
        augment_xy = self.dataset_train.augment_xy
        # helpers may take an optional `step` (e.g. the SSD helper's cls-loss
        # warm-up, reference vgg_at_pascalvoc.py:406-410); detect it once so
        # the traced step stays branch-free
        import inspect
        loss_takes_step = 'step' in inspect.signature(helper.calc_loss).parameters

        def step_fn(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
            images, labels = augment_xy(batch, rng, True)
            policy = policy_fn(state) if policy_fn is not None else None

            def loss_fn(params):
                variables = {'params': params, 'batch_stats': state.batch_stats}
                outputs, new_mstate = helper.forward_train(
                    model, variables, images, policy=policy,
                    labels=labels if self.forward_w_labels else None)
                if loss_takes_step:
                    loss, metrics = helper.calc_loss(labels, outputs, params,
                                                     step=state.step)
                else:
                    loss, metrics = helper.calc_loss(labels, outputs, params)
                if loss_extra_fn is not None:
                    extra_loss, extra_metrics = loss_extra_fn(state, outputs, images, labels)
                    loss = loss + extra_loss
                    metrics = {**metrics, **extra_metrics}
                return loss, (metrics, new_mstate.get('batch_stats', state.batch_stats))

            grads, (metrics, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
            if grad_transform_fn is not None:
                grads = grad_transform_fn(grads, state)
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_batch_stats, opt_state=new_opt_state)
            if post_update_fn is not None:
                state = post_update_fn(state)
            metrics = dict(metrics)
            return state, metrics

        state_sharding = self._state_sharding or self.repl_sharding
        return jax.jit(
            step_fn,
            in_shardings=(state_sharding, self.batch_sharding, self.repl_sharding),
            out_shardings=(state_sharding, self.repl_sharding),
            donate_argnums=(0,))

    def build_eval_step(self, policy_fn=None):
        helper = self.model_helper
        model = self.model
        augment_xy = self.dataset_eval.augment_xy

        def step_fn(state: TrainState, batch):
            images, labels = augment_xy(batch, jax.random.PRNGKey(0), False)
            policy = policy_fn(state) if policy_fn is not None else None
            variables = {'params': state.params, 'batch_stats': state.batch_stats}
            outputs = helper.forward_eval(model, variables, images, policy=policy)
            loss, metrics = helper.calc_loss(labels, outputs, state.params)
            return {'loss': loss, **metrics}

        state_sharding = self._state_sharding or self.repl_sharding
        return jax.jit(
            step_fn,
            in_shardings=(state_sharding, self.batch_sharding),
            out_shardings=self.repl_sharding)

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def put_batch(self, batch):
        """Place a host-local batch onto the global mesh, batch-sharded.

        Single process: plain (async) device_put.  Multi-host: every process
        holds its own shard (the dataset shards by jax.process_index()), so
        assemble the global array from process-local data — the DCN-side
        replacement for the reference's per-rank tf.data shards."""
        if jax.process_count() == 1:
            return jax.device_put(batch, self.batch_sharding)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                self.batch_sharding, np.asarray(x)), batch)

    def device_prefetch(self, iterator: Iterator, depth: int = 2) -> Iterator:
        """Overlap host->device batch copies with compute: keep `depth`
        batches in flight on the device (device_put is async) so the chip
        never waits on PCIe/DMA — the device-side half of the reference's
        `.prefetch()` (its tf.data prefetch only covers the host side)."""
        import collections
        buf = collections.deque()

        put = self.put_batch

        # a finite iterator must end cleanly (PEP 479 turns a StopIteration
        # escaping a generator into RuntimeError) and still yield the
        # batches already buffered
        try:
            for _ in range(depth):
                buf.append(put(next(iterator)))
            while True:
                buf.append(put(next(iterator)))
                yield buf.popleft()
        except StopIteration:
            pass
        while buf:
            yield buf.popleft()

    def run_train_loop(self, state: TrainState, train_step, nb_iters: Optional[int] = None,
                       save_path: Optional[str] = None, eval_fn=None,
                       iterator: Optional[Iterator] = None,
                       log_prefix: str = 'train') -> TrainState:
        """The hot loop (reference full_precision/learner.py:57-89)."""
        nb_iters = nb_iters if nb_iters is not None else self.nb_iters_train
        save_path = save_path or FLAGS.save_path
        iterator = iterator if iterator is not None else self.dataset_train.build()
        iterator = self.device_prefetch(iterator)
        monitor = ProgressMonitor(
            self.sm_writer if self.is_primary_worker() else None,
            self.dataset_train.batch_size, jax.process_count(), prefix=log_prefix)
        base_rng = self.next_rng()
        from pocketflow_tpu.core.profiling import ProfilerHook
        profiler = ProfilerHook()

        start = int(jax.device_get(state.step))
        for idx_iter in range(start, nb_iters):
            batch = next(iterator)
            rng = jax.random.fold_in(base_rng, idx_iter)
            profiler.before_step(idx_iter)
            state, metrics = train_step(state, batch, rng)
            profiler.after_step(idx_iter)
            if (idx_iter + 1) % FLAGS.summ_step == 0:
                host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()
                                if np.ndim(v) == 0}
                monitor.report(idx_iter + 1, FLAGS.summ_step, host_metrics)
            if (idx_iter + 1) % FLAGS.save_step == 0:
                # EVERY process participates: a multi-process state routes
                # save through orbax (cross-process collectives), and
                # eval_fn runs a jitted SPMD program over the global mesh —
                # primary-only calls would mismatch collectives and hang
                self.save_model(state, save_path)
                if eval_fn is not None:
                    eval_fn(state)
        profiler.close()
        self.save_model(state, save_path)
        ckpt_lib.wait_for_async_saves()  # orbax backend: flush before exit
        self.auto_barrier()
        return state

    def run_eval_loop(self, state: TrainState, eval_step, nb_batches: Optional[int] = None,
                      log_prefix: str = 'eval') -> Dict[str, float]:
        iterator = self.dataset_eval.build()
        if nb_batches is None:
            nb_smpls = getattr(self.dataset_eval, 'nb_smpls_loaded',
                               self.dataset_eval.spec.nb_smpls_eval)
            # Each global eval step consumes batch_size samples from EVERY
            # process's disjoint shard; the iterators cycle the set
            # seamlessly, so k batches score k*bs*P sample slots.  Pick the
            # smallest k >= ceil-coverage with k*bs*P an exact multiple of
            # nb_smpls (searching a bounded window): every sample then
            # appears exactly k*bs*P/nb_smpls times and the unweighted mean
            # is unbiased.  Otherwise fall back to ceil coverage (each
            # sample counted once or twice; strictly better than the old
            # floor coverage, which silently dropped the tail).
            per_step = self.dataset_eval.batch_size * jax.process_count()
            base = max(1, -(-nb_smpls // per_step))
            nb_batches = base
            # The exact-multiple argument needs EQUAL per-process shards:
            # strided sharding gives ceil/floor sizes when P does not divide
            # nb_smpls, and then k*bs/s_p differs across processes for every
            # k (samples on small shards would be over-counted).  Only claim
            # exact coverage when the shards are provably equal.
            if nb_smpls % max(1, jax.process_count()) == 0:
                for k in range(base, min(base * 8, base + 64) + 1):
                    if (k * per_step) % nb_smpls == 0:
                        nb_batches = k
                        break
        totals: Dict[str, float] = {}
        for _ in range(nb_batches):
            metrics = jax.device_get(eval_step(state, self.put_batch(next(iterator))))
            for key, value in metrics.items():
                if np.ndim(value) == 0:
                    totals[key] = totals.get(key, 0.0) + float(value)
        means = {k: v / nb_batches for k, v in totals.items()}
        self.log.info('%s: %s', log_prefix,
                      ' | '.join('%s = %.4f' % kv for kv in means.items()))
        return means

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def save_model(self, state: TrainState, save_path: Optional[str] = None) -> str:
        save_path = save_path or FLAGS.save_path
        step = int(jax.device_get(state.step))
        path = ckpt_lib.save(save_path, state, step)
        self.log.info('model saved to %s', path)
        return path

    def restore_model(self, target_state: TrainState,
                      save_path: Optional[str] = None) -> Optional[TrainState]:
        save_path = save_path or FLAGS.save_path
        restored = ckpt_lib.restore_latest(save_path, target_state)
        if restored is not None:
            self.log.info('model restored from %s',
                          ckpt_lib.latest_checkpoint(os.path.dirname(save_path) or '.'))
        return restored

    def set_extra(self, state: TrainState, extra: Any) -> TrainState:
        """Attach/replace the learner-specific `extra` tree, keeping the jit
        sharding contract consistent: under TP the state-sharding tree must
        be refreshed (masks follow their kernels' shapes; codebook shapes can
        change), otherwise the fused step's in_shardings mismatch."""
        if self.enbl_tp:
            extra_sharding = mesh_lib.infer_tp_sharding(extra, self.mesh)
            extra = jax.jit(lambda e: e, out_shardings=extra_sharding)(extra)
            if self._state_sharding is not None:
                self._state_sharding = self._state_sharding.replace(
                    extra=extra_sharding)
        else:
            extra = jax.device_put(extra, self.repl_sharding)
        return state.replace(extra=extra)

    def init_opt_state(self, tx, target):
        """Initialize an optimizer state with shardings consistent with the
        target tree (TP: momentum/trace leaves follow their params' sharding;
        otherwise replicated)."""
        if self.enbl_tp:
            skel = jax.eval_shape(tx.init, target)
            sharding = mesh_lib.infer_tp_sharding(skel, self.mesh)
        else:
            sharding = self.repl_sharding
        return jax.jit(tx.init, out_shardings=sharding)(target)

    def copy_state(self, state: TrainState) -> TrainState:
        """Deep-copy a TrainState's buffers.

        The fused train step donates its input state (zero-copy updates); any
        state that must survive repeated roll-outs (e.g. the pretrained
        baseline the RL optimizers re-start from) needs fresh buffers first.
        """
        # honor the TP sharding contract: a TP-sharded state must stay TP-
        # sharded (forcing replication blows up memory and silently reshards
        # back on the next train step); cache keyed on the sharding tree,
        # which set_extra may refresh
        sharding = self._state_sharding or self.repl_sharding
        cached = getattr(self, '_copy_jit_cache', None)
        if cached is None or cached[0] is not sharding:
            fn = jax.jit(
                lambda s: jax.tree_util.tree_map(lambda x: x + jnp.zeros_like(x), s),
                out_shardings=sharding)
            self._copy_jit_cache = (sharding, fn)
        return self._copy_jit_cache[1](state)

    def restore_baseline(self, state: TrainState,
                         save_path: Optional[str] = None) -> Tuple[TrainState, bool]:
        """Warm-start params/batch_stats from the pretrained full-precision
        baseline checkpoint, keeping this learner's own step/opt_state/extra.
        Returns (state, restored?)."""
        save_path = save_path or FLAGS.save_path
        fields = ckpt_lib.restore_fields(
            save_path, {'params': state.params, 'batch_stats': state.batch_stats})
        if fields is None:
            return state, False
        # under TP the restored leaves must follow the state's shardings —
        # forcing replication would spike per-device memory by the full
        # model size (the situation TP exists to avoid)
        if self.enbl_tp and self._state_sharding is not None:
            fields = {
                'params': jax.device_put(fields['params'],
                                         self._state_sharding.params),
                'batch_stats': jax.device_put(fields['batch_stats'],
                                              self._state_sharding.batch_stats),
            }
        else:
            fields = jax.device_put(fields, self.repl_sharding)
        self.log.info('baseline params restored from %s',
                      ckpt_lib.latest_checkpoint(os.path.dirname(save_path) or '.'))
        return state.replace(**fields), True

    def download_model(self):
        """Pretrained-model bootstrap (reference abstract_learner.py:105-125:
        wget ``model_http_url`` + tar -x into the model dir).

        If the save dir already holds a checkpoint this is a no-op; otherwise
        the primary worker fetches the tarball at ``--model_http_url``
        (http/https/file) and extracts it into the save dir (paths sanitized),
        while the other processes wait at the barrier — replacing the
        reference's rank-0 wget + MPI barrier."""
        save_dir = os.path.dirname(FLAGS.save_path) or '.'
        if ckpt_lib.latest_checkpoint(save_dir) is not None:
            return
        url = FLAGS.get('model_http_url')
        if not url:
            raise ValueError(
                'local model files do not exist and <model_http_url> is not '
                'set (reference abstract_learner.py:116-117)')
        if not url.endswith(('.tar', '.tar.gz', '.tgz')):
            # reference semantics: the flag is a BASE url and the per-model
            # tarball name 'models_<model>_at_<dataset>.tar.gz' is appended
            # (reference abstract_learner.py:90,118)
            tarball = 'models_%s_at_%s.tar.gz' % (
                getattr(self.model_helper, 'model_name', 'model'),
                getattr(self.model_helper, 'dataset_name', 'dataset'))
            url = url.rstrip('/') + '/' + tarball
        if self.is_primary_worker():
            import tarfile
            import tempfile
            import urllib.request
            os.makedirs(save_dir, exist_ok=True)
            with tempfile.NamedTemporaryFile(suffix='.tar.gz') as tmp:
                with urllib.request.urlopen(url) as resp:
                    while True:
                        chunk = resp.read(1 << 20)
                        if not chunk:
                            break
                        tmp.write(chunk)
                tmp.flush()
                with tarfile.open(tmp.name) as tar:
                    # flatten + sanitize: plain files only, by basename,
                    # never absolute/parent paths; reject colliding
                    # basenames (two dirs shipping the same file would
                    # silently overwrite) and bound total extracted bytes
                    seen = set()
                    budget = 16 << 30  # 16 GiB: far above any model tarball
                    for member in tar.getmembers():
                        if not member.isfile():
                            continue
                        name = os.path.basename(member.name)
                        if not name or name.startswith('..'):
                            continue
                        if name in seen:
                            raise ValueError(
                                'tarball %s has duplicate basename %r — '
                                'refusing to silently overwrite' % (url, name))
                        seen.add(name)
                        budget -= max(0, member.size)
                        if budget < 0:
                            raise ValueError(
                                'tarball %s exceeds the extraction size '
                                'bound' % url)
                        src = tar.extractfile(member)
                        with open(os.path.join(save_dir, name), 'wb') as out:
                            while True:
                                chunk = src.read(1 << 20)
                                if not chunk:
                                    break
                                out.write(chunk)
            self.log.info('pretrained model fetched from %s into %s',
                          url, save_dir)
        self.auto_barrier()
        if ckpt_lib.latest_checkpoint(save_dir) is None:
            raise FileNotFoundError(
                'no checkpoint found under %s after downloading %s'
                % (save_dir, url))

    # ------------------------------------------------------------------
    # distributed helpers (reference :127-148)
    # ------------------------------------------------------------------

    def auto_barrier(self):
        mesh_lib.auto_barrier()

    @classmethod
    def is_primary_worker(cls, scope: str = 'global') -> bool:
        return mesh_lib.is_primary_worker(scope)


def iter_or_self(built):
    """build() may return iterator or (train_iter, val_iter)."""
    if isinstance(built, tuple):
        return built[0]
    return built
