"""Round-4 cold-start attribution, take 2: forced D2H barriers.

coldstart_r4.py showed jax.block_until_ready returning immediately on
the axon backend while ~360 s of queued device work drained inside the
NEXT tiny operation (jax.random.key).  This probe forces completion
with 1-element D2H fetches (a fetch cannot return before the buffer
exists), attributing the hidden 360 s leaf by leaf:

  * roots transfer (403 MB chunked f32)
  * each SHT table leaf (chirps, fftmm factors, cap bands, Lambda chunks)
  * the deserialized executable's remote program load (first execution
    after everything else is forced)
"""

import os
import sys
import time
import pickle

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def force(x):
    """Force one device buffer to exist via a 1-element D2H fetch."""
    import jax.numpy as jnp
    import numpy as _np

    v = jnp.ravel(x)[:1]
    if jnp.iscomplexobj(v):
        v = jnp.real(v)
    return _np.asarray(v)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    t_all = time.time()
    dev = jax.devices()[0]
    # flush backend init with one tiny program + fetch
    t0 = time.time()
    force(jnp.zeros(8))
    log(f"device {dev}; backend init flush {time.time()-t0:.1f}s")

    from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated
    from cora_tpu.util import xfer

    nside, nfreq, fchunk, fleg, lchunk = 512, 256, 4, 128, 256
    lmax = 3 * nside - 1
    bc = os.path.join(REPO, ".bench_cache")

    t0 = time.time()
    roots = np.load(os.path.join(bc, f"roots_{nside}_{nfreq}.npy"))
    log(f"roots disk load: {time.time()-t0:.1f}s")
    t0 = time.time()
    roots_d = xfer.put(roots)
    force(roots_d)
    dt = time.time() - t0
    log(f"roots H2D forced: {dt:.1f}s ({roots.nbytes/1e6:.0f} MB, "
        f"{roots.nbytes/1e6/dt:.1f} MB/s)")

    t0 = time.time()
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             l_chunk=lchunk, precision="highest", fft_cmul="xla",
             lambda_build="device",
             ckpt_cache=os.path.join(bc, f"ck_{nside}_{lchunk}_1.npz"),
             lambda_cache=os.path.join(bc, f"lam_{nside}_{lchunk}.npz"))
    log(f"SHT.__init__: {time.time()-t0:.1f}s")

    t0 = time.time()
    tabs = op.tables(False)
    log(f"tables() dispatch: {time.time()-t0:.1f}s")

    # force every leaf, log the slow ones
    t_leaves = time.time()
    slow = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tabs)[0]:
        t0 = time.time()
        force(leaf)
        dt = time.time() - t0
        if dt > 1.0:
            name = jax.tree_util.keystr(path)
            slow.append((name, dt, leaf.nbytes / 1e6))
            log(f"  leaf {name}: {dt:.1f}s ({leaf.nbytes/1e6:.0f} MB)")
    log(f"all table leaves forced: {time.time()-t_leaves:.1f}s total")

    def _one(key, r, t):
        return synthesis_scan_correlated(
            op, t, r, key, fleg, fchunk,
            lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
            xi_dtype=jnp.float32,
        )

    step_fn = jax.jit(_one)
    kind_tag = dev.device_kind.replace(" ", "")
    exe_path = os.path.join(
        bc, f"exe_{nside}_{nfreq}_{fchunk}_{fleg}_{lchunk}_cached"
            f"_f32_highest_1_{jax.__version__}_{kind_tag}.pkl")

    t0 = time.time()
    key0 = jax.random.key(0, impl="rbg")
    force(jax.random.key_data(key0))
    log(f"rbg key creation forced: {time.time()-t0:.1f}s")

    from jax.experimental.serialize_executable import deserialize_and_load
    t0 = time.time()
    with open(exe_path, "rb") as fh:
        compiled = deserialize_and_load(*pickle.load(fh))
    log(f"deserialize_and_load: {time.time()-t0:.1f}s "
        f"({os.path.getsize(exe_path)/1e6:.0f} MB)")

    t0 = time.time()
    out = compiled(key0, roots_d, tabs)
    s = float(out)  # D2H forces
    log(f"first execution (remote program load + step): {time.time()-t0:.1f}s "
        f"sum={s:.3e}")

    for i in range(2):
        t0 = time.time()
        out = compiled(jax.random.key(i + 1, impl="rbg"), roots_d, tabs)
        s = float(out)
        log(f"step {i}: {time.time()-t0:.3f}s")

    log(f"TOTAL wall: {time.time()-t_all:.1f}s")


if __name__ == "__main__":
    main()
