"""Device selection helpers.

Rebuild of /root/reference/utils/get_idle_gpus.py:1-54: the reference shells
out to nvidia-smi to pick idle GPUs before launching.  TPU chips are not
shared that way; the analogue is choosing how many local devices join the
mesh (e.g. to leave chips for a concurrent job) and validating the request.
"""

from __future__ import annotations

from typing import List, Optional

import jax


def honor_jax_platforms():
    """Apply the JAX_PLATFORMS env var even when a sitecustomize pre-imported
    jax with another platform baked in (the env var alone is ignored once jax
    is imported).  CLI tools call this FIRST in main() — e.g. running the
    export/serving tools with JAX_PLATFORMS=cpu on a host whose accelerator
    tunnel is unavailable must not hang in backend init."""
    import os
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def list_devices() -> List[jax.Device]:
    return list(jax.devices())


def pick_devices(nb_devices: Optional[int] = None) -> List[jax.Device]:
    """First `nb_devices` addressable devices (all when None)."""
    devices = list_devices()
    if nb_devices is None:
        return devices
    if nb_devices > len(devices):
        raise RuntimeError('requested %d devices but only %d are available'
                           % (nb_devices, len(devices)))
    return devices[:nb_devices]
