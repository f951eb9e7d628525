"""Probe: can the axon backend's first-execution session flush overlap
host-side setup work?

tools/coldstart_r4b*.out showed the first program execution on this
service pays a one-time 72-306 s session-init flush (bimodal: ~300 s
cold service, ~72 s if another process used it recently), and that it
attaches to the first *executed program*, not to transfers (roots H2D
blocked fine before it in coldstart_r4.out).

This probe dispatches a trivial program at t=0 WITHOUT blocking, does
(simulated) host work, then blocks — if the flush proceeds server-side
meanwhile, the remaining block time is (flush - host_work), and bench.py
can hide most of the session init behind its real host setup.

Also times 30 individual small device_puts vs one batched put, to
attribute the per-call dispatch cost seen in tables() (39-44 s for ~45
puts in coldstart_r4b.out).
"""

import time
import sys

import numpy as np

t_start = time.time()


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] (+{time.time()-t_start:6.1f}s) {msg}",
          flush=True)


import jax
import jax.numpy as jnp

dev = jax.devices()[0]
log(f"device {dev}")

# 1. dispatch trivial exec, DO NOT block
t0 = time.time()
y = jax.jit(lambda x: x + 1)(jnp.zeros(128, jnp.float32))
log(f"trivial exec dispatched (async): {time.time()-t0:.2f}s")

# 2. simulated host setup
HOST_WORK_S = float(sys.argv[1]) if len(sys.argv) > 1 else 75.0
log(f"sleeping {HOST_WORK_S:.0f}s (stand-in for host setup)...")
time.sleep(HOST_WORK_S)

# 3. block: remaining flush
t0 = time.time()
y.block_until_ready()
log(f"block on trivial exec: {time.time()-t0:.1f}s remaining flush")

# 4. second exec should be fast now
t0 = time.time()
jax.jit(lambda x: x * 2)(jnp.ones(128, jnp.float32)).block_until_ready()
log(f"second exec (compile+run): {time.time()-t0:.1f}s")

# 5. per-put dispatch cost: 30 small puts vs one batched put
t0 = time.time()
bufs = [jax.device_put(np.full((256, 256), i, np.float32)) for i in range(30)]
log(f"30 individual device_put dispatches: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(bufs)
log(f"block on all 30: {time.time()-t0:.1f}s")

t0 = time.time()
big = jax.device_put(np.zeros((30, 256, 256), np.float32))
log(f"1 batched device_put dispatch: {time.time()-t0:.1f}s")
t0 = time.time()
big.block_until_ready()
log(f"block on batched: {time.time()-t0:.1f}s")

# 6. per-exec dispatch cost: is it ~1 s per jit CALL too?
f = jax.jit(lambda x: x + 1)
f(big).block_until_ready()
t0 = time.time()
outs = [f(big) for _ in range(10)]
log(f"10 cached-jit dispatches: {time.time()-t0:.2f}s")
t0 = time.time()
jax.block_until_ready(outs)
log(f"block on 10: {time.time()-t0:.2f}s")

log(f"TOTAL wall: {time.time()-t_start:.1f}s")
