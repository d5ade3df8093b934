"""Checkpoint save/restore for parameter pytrees.

Replaces the reference's `tf.train.Saver` per-graph checkpoints
(/root/reference/learners/abstract_learner.py:105-125, full_precision/learner.py:180-205).
In the reference, checkpoints double as the *transport* between the train and
eval graphs; in JAX there is only one set of pure functions, so checkpoints are
purely for persistence/resume.

Format: msgpack via flax.serialization (single file per step), with a tiny
`checkpoint` index file recording the latest step — mirroring the
`checkpoint`/`model.ckpt-NNN` naming convention so tooling feels familiar.
Orbax is intentionally avoided in the core path to keep restores synchronous
and dependency-light; the export tools handle serving formats.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
from flax import serialization

from pocketflow_tpu.config import FLAGS

FLAGS.DEFINE_string('ckpt_backend', 'msgpack',
                    "checkpoint backend: 'msgpack' (sync, single file) | "
                    "'orbax' (async, sharded-array aware)")

INDEX_FILE = 'checkpoint'


# -- orbax backend (async save for big / sharded models) -----------------------

_ORBAX_MANAGERS = {}


def _orbax_manager(save_dir: str):
    import orbax.checkpoint as ocp
    if save_dir not in _ORBAX_MANAGERS:
        _ORBAX_MANAGERS[save_dir] = ocp.CheckpointManager(
            os.path.abspath(save_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=5,
                                                 enable_async_checkpointing=True))
    return _ORBAX_MANAGERS[save_dir]


def _orbax_save(save_path: str, state: Any, step: int) -> str:
    import orbax.checkpoint as ocp
    save_dir = os.path.dirname(save_path) or '.'
    os.makedirs(save_dir, exist_ok=True)
    mgr = _orbax_manager(save_dir)
    mgr.save(step, args=ocp.args.StandardSave(state))
    return os.path.join(save_dir, str(step))


def _orbax_restore_latest(save_path: str, target: Any) -> Optional[Any]:
    import orbax.checkpoint as ocp
    save_dir = os.path.dirname(save_path) or '.'
    if not os.path.isdir(save_dir):
        return None
    mgr = _orbax_manager(save_dir)
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(target))


def _orbax_restore_raw(save_path: str) -> Optional[Any]:
    """Restore the newest orbax checkpoint as a raw (untyped) pytree."""
    import orbax.checkpoint as ocp
    save_dir = os.path.dirname(save_path) or '.'
    if not os.path.isdir(save_dir):
        return None
    mgr = _orbax_manager(save_dir)
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore())


def wait_for_async_saves():
    """Block until in-flight orbax async saves complete (call before exit)."""
    for mgr in _ORBAX_MANAGERS.values():
        mgr.wait_until_finished()


def _index_path(save_dir: str) -> str:
    return os.path.join(save_dir, INDEX_FILE)


def _ckpt_path(save_path: str, step: int) -> str:
    return '%s-%d.msgpack' % (save_path, step)


def save(save_path: str, state: Any, step: int) -> str:
    """Save a pytree under `<save_path>-<step>.msgpack`, update the index."""
    if FLAGS.get('ckpt_backend', 'msgpack') == 'orbax':
        return _orbax_save(save_path, state, step)
    # msgpack requires fully-addressable leaves; under multi-process tensor
    # parallelism a TP-sharded leaf spans processes and device_get would
    # raise — route those saves through the sharded-array-aware backend
    if jax.process_count() > 1 and not all(
            getattr(x, 'is_fully_addressable', True)
            for x in jax.tree_util.tree_leaves(state)):
        import logging
        logging.getLogger('pocketflow_tpu').warning(
            'msgpack backend cannot save cross-process sharded arrays; '
            'using orbax for this checkpoint (set --ckpt_backend=orbax '
            'to silence)')
        return _orbax_save(save_path, state, step)
    save_dir = os.path.dirname(save_path) or '.'
    os.makedirs(save_dir, exist_ok=True)
    path = _ckpt_path(save_path, step)
    # every process may call save() (the orbax path REQUIRES that — its
    # finalize is a cross-process collective); for the local msgpack format
    # only the primary writes
    if jax.process_index() == 0:
        state = jax.device_get(state)
        with open(path + '.tmp', 'wb') as fout:
            fout.write(serialization.to_bytes(state))
        os.replace(path + '.tmp', path)
        # index write must be atomic too: a crash mid-write would brick
        # every future restore even though the data file is intact
        idx = _index_path(save_dir)
        with open(idx + '.tmp', 'w') as fout:
            json.dump({'latest': os.path.basename(path), 'step': int(step)},
                      fout)
        os.replace(idx + '.tmp', idx)
    return path


def _orbax_latest_step_dir(save_dir: str) -> Optional[int]:
    """Newest COMMITTED orbax step directory under save_dir, or None.

    Orbax's CheckpointManager lays out `<save_dir>/<step>/`; in-progress
    saves carry a `.orbax-checkpoint-tmp-*` suffix, so pure-digit dirs are
    the committed ones."""
    if not os.path.isdir(save_dir):
        return None
    steps = [int(d) for d in os.listdir(save_dir)
             if d.isdigit() and os.path.isdir(os.path.join(save_dir, d))]
    return max(steps) if steps else None


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Path of the newest checkpoint in `save_dir`, or None.

    Knows both backends: the msgpack index file and orbax step dirs — a
    run saved through the orbax fallback must still register as 'has a
    checkpoint' (download_model/resume existence checks rely on this)."""
    idx = _index_path(save_dir)
    if not os.path.exists(idx):
        step = _orbax_latest_step_dir(save_dir)
        return os.path.join(save_dir, str(step)) if step is not None else None
    with open(idx) as fin:
        try:
            meta = json.load(fin)
        except (json.JSONDecodeError, UnicodeDecodeError) as exc:
            # e.g. a TF1 proto-text 'checkpoint' index from the reference's
            # model zoo tarballs — not this framework's format
            raise ValueError(
                "checkpoint index %s is not this framework's JSON format "
                '(TF1 checkpoints from the reference model zoo cannot be '
                'loaded directly): %s' % (idx, exc)) from exc
    path = os.path.join(save_dir, meta['latest'])
    return path if os.path.exists(path) else None


def latest_step(save_dir: str) -> Optional[int]:
    idx = _index_path(save_dir)
    if not os.path.exists(idx):
        return _orbax_latest_step_dir(save_dir)
    with open(idx) as fin:
        return int(json.load(fin).get('step', 0))


def restore(path: str, target: Any) -> Any:
    """Restore a pytree saved by `save` into the structure of `target`."""
    with open(path, 'rb') as fin:
        return serialization.from_bytes(target, fin.read())


def restore_latest(save_path: str, target: Any) -> Optional[Any]:
    """Restore the newest checkpoint next to `save_path`, or None if absent."""
    if FLAGS.get('ckpt_backend', 'msgpack') == 'orbax':
        return _orbax_restore_latest(save_path, target)
    path = latest_checkpoint(os.path.dirname(save_path) or '.')
    if path is None:
        # a multi-process TP run may have fallen back to orbax on save
        if jax.process_count() > 1:
            return _orbax_restore_latest(save_path, target)
        return None
    if os.path.isdir(path):  # orbax step dir found by latest_checkpoint
        return _orbax_restore_latest(save_path, target)
    return restore(path, target)


def restore_intersecting(save_path: str, params, subtree: str = 'params',
                         prefix_map: Optional[dict] = None):
    """Copy every leaf from the newest checkpoint whose path AND shape match
    into `params`; everything else keeps its current value.

    The functional analogue of the reference's warm-start-with-renaming
    restores (nets/vgg_at_pascalvoc.py:479-552): a detection backbone absorbs
    the conv weights of a classification checkpoint by name intersection.
    `prefix_map` optionally rewrites source prefixes ('model/' -> 'vgg/').
    Returns (params, nb_restored_leaves).
    """
    import numpy as np
    path = latest_checkpoint(os.path.dirname(save_path) or '.')
    if path is None:
        return params, 0
    if os.path.isdir(path):  # orbax step dir
        raw = _orbax_restore_raw(save_path)
        if raw is None:
            return params, 0
    else:
        with open(path, 'rb') as fin:
            raw = serialization.msgpack_restore(fin.read())
    src = raw.get(subtree, raw)

    def flatten(node, prefix=''):
        out = {}
        if isinstance(node, dict):
            for key, value in node.items():
                out.update(flatten(value, prefix + key + '/'))
        else:
            out[prefix[:-1]] = node
        return out

    flat_src = flatten(src)
    if prefix_map:
        remapped = {}
        for key, value in flat_src.items():
            for old, new in prefix_map.items():
                if key.startswith(old):
                    key = new + key[len(old):]
                    break
            remapped[key] = value
        flat_src = remapped

    count = [0]

    def graft(path_entries, leaf):
        key = '/'.join(str(getattr(p, 'key', p)) for p in path_entries)
        cand = flat_src.get(key)
        if cand is not None and tuple(np.shape(cand)) == tuple(leaf.shape):
            count[0] += 1
            return jax.numpy.asarray(cand, dtype=leaf.dtype)
        return leaf

    params = jax.tree_util.tree_map_with_path(graft, params)
    return params, count[0]


def restore_fields(save_path: str, targets: dict) -> Optional[dict]:
    """Restore only the named top-level TrainState fields from the newest
    checkpoint next to `save_path` (e.g. {'params': ..., 'batch_stats': ...}).

    This is the cross-learner transport: a compression learner warm-starts
    from the FullPrec baseline even though its own opt_state/extra trees have
    different structures — the analogue of the reference's variable-scope
    renamed restores (distillation_helper.py:122-145).
    """
    path = latest_checkpoint(os.path.dirname(save_path) or '.')
    if path is None:
        # the checkpoint may have been written by the orbax backend
        # (explicitly, or as the multi-process-TP fallback in save())
        if (FLAGS.get('ckpt_backend', 'msgpack') == 'orbax'
                or jax.process_count() > 1):
            raw = _orbax_restore_raw(save_path)
            if raw is not None:
                return {key: serialization.from_state_dict(target, raw[key])
                        for key, target in targets.items()}
        return None
    if os.path.isdir(path):  # orbax step dir
        raw = _orbax_restore_raw(save_path)
        if raw is None:
            return None
    else:
        with open(path, 'rb') as fin:
            raw = serialization.msgpack_restore(fin.read())
    return {key: serialization.from_state_dict(target, raw[key])
            for key, target in targets.items()}
