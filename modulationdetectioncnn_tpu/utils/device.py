"""Device/tunnel warmup helpers.

The tunneled TPU platform in this environment pays a large one-time cost on
the first device->host transfer (measured 90-360 s this session; subsequent
transfers are ~30 ms). ``warm_transfer_async`` starts that initialization on
a daemon thread so it overlaps host-side work (dataset generation, compiles)
instead of stalling the first eval/metric fetch. On a direct-attached TPU
this is a harmless ~ms no-op.
"""
from __future__ import annotations

import threading

_started = False
_done = threading.Event()


def _warm():
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jax.jit(lambda: jnp.zeros(()))())
    finally:
        _done.set()


def warm_transfer_async() -> threading.Event:
    """Kick off first-transfer initialization in the background (idempotent).

    Returns an Event that is set once the transfer channel is warm.
    """
    global _started
    if not _started:
        _started = True
        threading.Thread(target=_warm, daemon=True, name="amc-warm-xfer").start()
    return _done
