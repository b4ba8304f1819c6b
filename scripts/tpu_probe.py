"""Tunnel health probe: one trivial jit with a short alarm.

Run BEFORE any TPU experiment chain, and again when a compile seems to
hang: if this hangs too, the axon tunnel / chip claim is wedged
(observed to last ~1-2 h) — back off and do CPU work; do NOT keep
launching TPU processes.  Exit 0 = healthy, SIGALRM kill (142) = wedged.
"""

import signal
import time

signal.alarm(180)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

t0 = time.perf_counter()
y = jax.jit(lambda a: (a * 2 + 1).sum())(jnp.arange(1024, dtype=jnp.float32))
print(f"tunnel ok: jit sum={float(y):.0f} in {time.perf_counter()-t0:.1f}s "
      f"on {jax.devices()[0].platform}")
