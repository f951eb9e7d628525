"""Benchmark: full 21cm cube synthesis (flagship config Nside=512 × 256 freq).

Pipeline timed (steady-state, on device): channel-integrated C_l grid
(device gather-lerp) → per-ell covariance root + correlated a_lm draw →
native batched SHT → maps.  This is the reference's `cora-makesky 21cm`
inner loop (SURVEY.md §3.1) as one compiled program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): < 5 s on one v5e chip.
"""

import argparse
import json
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)  # Legendre recurrence needs f64

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nside", type=int, default=512)
    p.add_argument("--nfreq", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--fchunk", type=int, default=32)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    from cora_tpu.signal.corr21cm import Corr21cm
    from cora_tpu.signal import clfast
    from cora_tpu.core.skysim import draw_correlated_alm
    from cora_tpu.healpix.sht import get_sht

    nside, nfreq = args.nside, args.nfreq
    lmax = 3 * nside - 1
    freqs = np.linspace(400.0, 800.0, nfreq, endpoint=False)

    t0 = time.time()
    model = Corr21cm()
    tables = clfast.build_cl_tables(model, freqs)
    tables = jax.device_put(tables, dev)
    print(f"# host table setup: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    op = get_sht(nside, lmax)
    print(f"# SHT geometry setup: {time.time()-t0:.1f}s", file=sys.stderr)

    cl_fn = jax.jit(lambda t: clfast.cl_grid(t, lmax))
    draw_fn = jax.jit(
        lambda cla, key: draw_correlated_alm(cla, key, dtype=jnp.complex64)
    )
    synth_fn = jax.jit(op.synthesis)

    def step(key):
        cla = cl_fn(tables)
        alm = draw_fn(cla, key)
        outs = []
        for i in range(0, nfreq, args.fchunk):
            outs.append(synth_fn(alm[i : i + args.fchunk]))
        sky = jnp.concatenate(outs, axis=0)
        sky.block_until_ready()
        return sky

    # Warmup / compile
    t0 = time.time()
    sky = step(jax.random.PRNGKey(0))
    print(
        f"# warmup (incl. compile): {time.time()-t0:.1f}s; sky std "
        f"{float(sky.std()):.3e} K",
        file=sys.stderr,
    )

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        step(jax.random.PRNGKey(i + 1))
        times.append(time.time() - t0)
    best = min(times)
    print(f"# times: {['%.2f' % t for t in times]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"full 21cm cube synth (Nside={nside} x {nfreq} freq)",
                "value": round(best, 3),
                "unit": "s",
                "vs_baseline": round(5.0 / best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
