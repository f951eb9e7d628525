"""Round-4 cold-start attribution at the flagship config (Nside=512 x 256).

BENCH_r03 recorded warmup_s=311 despite an AOT executable cache hit, vs
the 154 s "remote program load" measured earlier in round 3.  Hypothesis:
jax.device_put and the device-Lambda build are ASYNC — bench.py's sht_s
only times dispatch, and the actual multi-GB tunnel transfers + the
Lambda-build execution complete inside warmup_s.  This probe inserts
explicit block_until_ready() barriers after every phase so each cost is
attributed exactly once.

Usage: python tools/coldstart_r4.py [--nside 512 --nfreq 256 ...]
"""

import argparse
import os
import sys
import time
import pickle

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nside", type=int, default=512)
    p.add_argument("--nfreq", type=int, default=256)
    p.add_argument("--fchunk", type=int, default=4)
    p.add_argument("--fleg", type=int, default=128)
    p.add_argument("--lchunk", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    t_start = time.time()
    dev = jax.devices()[0]
    log(f"device: {dev} ({time.time()-t_start:.1f}s to init)")

    from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated
    from cora_tpu.util import xfer

    nside, nfreq = args.nside, args.nfreq
    lmax = 3 * nside - 1
    bc = os.path.join(REPO, ".bench_cache")

    # phase 1: roots from disk + transfer, blocked
    t0 = time.time()
    roots = np.load(os.path.join(bc, f"roots_{nside}_{nfreq}.npy"))
    t_load = time.time() - t0
    t0 = time.time()
    roots_d = xfer.put(roots)
    jax.block_until_ready(roots_d)
    t_roots_xfer = time.time() - t0
    log(f"roots: disk {t_load:.1f}s, transfer+block {t_roots_xfer:.1f}s "
        f"({roots.nbytes/1e6:.0f} MB -> {roots.nbytes/1e6/max(t_roots_xfer,1e-9):.0f} MB/s)")

    # phase 2: SHT host-side construction (includes ck npz load)
    t0 = time.time()
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             l_chunk=args.lchunk, precision="highest",
             fft_cmul="xla" if nside > 256 else "karatsuba",
             lambda_build="device",
             ckpt_cache=os.path.join(bc, f"ck_{nside}_{args.lchunk}_1.npz"),
             lambda_cache=os.path.join(bc, f"lam_{nside}_{args.lchunk}.npz"))
    t_init = time.time() - t0
    log(f"SHT.__init__ (host tables + ck load): {t_init:.1f}s")

    # phase 3: tables() — dispatches transfers + device-Lambda build
    t0 = time.time()
    tabs = op.tables(False)
    t_tabdisp = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(tabs)
    t_tabblock = time.time() - t0
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(tabs)
                 if hasattr(x, "nbytes"))
    log(f"tables(): dispatch {t_tabdisp:.1f}s, block {t_tabblock:.1f}s "
        f"({nbytes/1e9:.2f} GB on device)")

    # phase 4: build the step fn + AOT cache load
    fchunk, fleg = args.fchunk, args.fleg

    def _one(key, r, t):
        return synthesis_scan_correlated(
            op, t, r, key, fleg, fchunk,
            lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
            xi_dtype=jnp.float32,
        )

    step_fn = jax.jit(_one)
    kind_tag = dev.device_kind.replace(" ", "")
    exe_path = os.path.join(
        bc,
        f"exe_{nside}_{nfreq}_{fchunk}_{fleg}_{args.lchunk}_cached"
        f"_f32_highest_1_{jax.__version__}_{kind_tag}.pkl")
    compiled = None
    if os.path.exists(exe_path):
        t0 = time.time()
        from jax.experimental.serialize_executable import deserialize_and_load
        with open(exe_path, "rb") as fh:
            compiled = deserialize_and_load(*pickle.load(fh))
        log(f"AOT exe deserialize_and_load: {time.time()-t0:.1f}s "
            f"({os.path.getsize(exe_path)/1e6:.0f} MB)")
    else:
        t0 = time.time()
        compiled = step_fn.lower(
            jax.random.key(0, impl="rbg"), roots_d, tabs).compile()
        log(f"compile (no AOT cache): {time.time()-t0:.1f}s")

    # phase 5: first execution = remote program load + one step
    key = jax.random.key(0, impl="rbg")
    t0 = time.time()
    out = compiled(key, roots_d, tabs)
    jax.block_until_ready(out)
    t_first = time.time() - t0
    log(f"first execution (program load + step): {t_first:.1f}s "
        f"sum={float(out):.3e}")

    # steady steps
    for i in range(2):
        t0 = time.time()
        out = compiled(jax.random.key(i + 1, impl="rbg"), roots_d, tabs)
        jax.block_until_ready(out)
        log(f"step {i}: {time.time()-t0:.3f}s")

    log(f"TOTAL wall: {time.time()-t_start:.1f}s")


if __name__ == "__main__":
    main()
