"""Device selection helpers.

Rebuild of /root/reference/utils/get_idle_gpus.py:1-54: the reference shells
out to nvidia-smi to pick idle GPUs before launching.  TPU chips are not
shared that way; the analogue is choosing how many local devices join the
mesh (e.g. to leave chips for a concurrent job) and validating the request.
"""

from __future__ import annotations

from typing import List, Optional

import jax


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
