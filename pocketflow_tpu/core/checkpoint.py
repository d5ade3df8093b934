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

INDEX_FILE = 'checkpoint'


def _index_path(save_dir: str) -> str:
    return os.path.join(save_dir, INDEX_FILE)


def _ckpt_path(save_path: str, step: int) -> str:
    return '%s-%d.msgpack' % (save_path, step)


def save(save_path: str, state: Any, step: int) -> str:
    """Save a pytree under `<save_path>-<step>.msgpack`, update the index."""
    save_dir = os.path.dirname(save_path) or '.'
    os.makedirs(save_dir, exist_ok=True)
    state = jax.device_get(state)
    path = _ckpt_path(save_path, step)
    with open(path + '.tmp', 'wb') as fout:
        fout.write(serialization.to_bytes(state))
    os.replace(path + '.tmp', path)
    with open(_index_path(save_dir), 'w') as fout:
        json.dump({'latest': os.path.basename(path), 'step': int(step)}, fout)
    return path


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Path of the newest checkpoint in `save_dir`, or None."""
    idx = _index_path(save_dir)
    if not os.path.exists(idx):
        return None
    with open(idx) as fin:
        meta = json.load(fin)
    path = os.path.join(save_dir, meta['latest'])
    return path if os.path.exists(path) else None


def latest_step(save_dir: str) -> Optional[int]:
    idx = _index_path(save_dir)
    if not os.path.exists(idx):
        return None
    with open(idx) as fin:
        return int(json.load(fin).get('step', 0))


def restore(path: str, target: Any) -> Any:
    """Restore a pytree saved by `save` into the structure of `target`."""
    with open(path, 'rb') as fin:
        return serialization.from_bytes(target, fin.read())


def restore_latest(save_path: str, target: Any) -> Optional[Any]:
    """Restore the newest checkpoint next to `save_path`, or None if absent."""
    path = latest_checkpoint(os.path.dirname(save_path) or '.')
    if path is None:
        return None
    return restore(path, target)


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
        return None
    with open(path, 'rb') as fin:
        raw = serialization.msgpack_restore(fin.read())
    return {key: serialization.from_state_dict(target, raw[key])
            for key, target in targets.items()}
