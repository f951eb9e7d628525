"""Analysis (map2alm) accuracy sweep: the side-by-side table for BASELINE.md.

Measures the alm round-trip error  |map2alm(alm2map(a)) - a| / |a|  on CPU
in float64 for nside in {32, 64, 128}, at the band-limited lmax = 2*nside
and the full lmax = 3*nside - 1, for

* ``jacobi3`` — the default pixel-area quadrature + 3 Jacobi refinement
  iterations (healpy's ``map2alm(iter=3)`` contract shape; healpy's ring
  weights add a better m=0 colatitude quadrature on top, see below),
* ``cg10`` / ``cg40`` — conjugate gradients on the quadrature normal
  equations (one synthesis + one adjoint per iteration, same cost per
  iteration as Jacobi).

Input alm are drawn from the tpu_validate spectrum C_l = (l/10)^-2.5 so
the headline matches the hardware metric.  Also reports the error
restricted to l <= 2*nside (``band`` columns) to separate the corner-mode
(l ~ 2.5*nside+) behaviour from the quadrature-accurate band.

Ring-weight experiments (recorded here so the conclusion is reproducible;
see VERDICT round 1 item 2): colatitude quadrature weights that make the
m=0 Legendre quadrature exact up to degree 4*nside-2 (the classical
construction) come out oscillating in [-7, +10] x uniform on the HEALPix
ring layout and make the analysis DIVERGE under iterative refinement
(order-unity iter=0 error; 1e2+ after 3 iterations) because they amplify
the polar-cap m-aliasing the m=0 system does not see.  An aliasing-aware
least-squares system (conditions for every (l, m) with m = 0 mod nq_r)
stays closer to uniform but still oscillates and still diverges at
full lmax, beating pixel-area weights only marginally (7.7e-7 vs 1.8e-6
at nside=64, lmax=2*nside, 3 iterations) in the band where the default
already meets the contract.  Iterative refinement (Jacobi or CG) over
uniform pixel-area weights subsumes what the weights buy: the residual
iteration corrects the full quadrature error (m=0 AND aliasing), not
just the colatitude part.  Hence cora_tpu ships no weight tables.

Reference behaviour being matched: cora/util/hputil.py:46-47 wraps
healpy.map2alm(map, iter=2/3, use_weights=...); upstream cora relies on
it only for smooth (steep-spectrum) maps, where the l <= 2*nside band
dominates.

Run:  python tools/analysis_accuracy.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cora_tpu.healpix.sht import (  # noqa: E402
    SHT,
    _analysis_cg_grid_jit,
    _analysis_grid_jit,
    _synthesis_grid,
)


def draw_alm(L, seed=1):
    l = np.arange(L, dtype=np.float64)
    with np.errstate(divide="ignore"):
        cl = np.where(l < 1, 0.0, (l / 10.0) ** -2.5)
    rng = np.random.RandomState(seed)
    alm = (rng.randn(L, L) + 1j * rng.randn(L, L)) / np.sqrt(2)
    alm[:, 0] = alm[:, 0].real * np.sqrt(2)
    alm *= np.sqrt(cl)[:, None]
    alm *= np.arange(L)[None, :] <= np.arange(L)[:, None]
    return alm


def rel_err(a, alm, lcap=None):
    a = np.asarray(a)
    sl = slice(2, lcap)
    return float(
        np.linalg.norm(a[sl] - alm[sl]) / np.linalg.norm(alm[sl])
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="nside 32/64 only, cg <= 10")
    args = ap.parse_args()

    nsides = (32, 64) if args.quick else (32, 64, 128)
    methods = [("jacobi3", "jacobi", 3), ("cg10", "cg", 10)]
    if not args.quick:
        methods.append(("cg40", "cg", 40))

    rows = []
    for nside in nsides:
        for lmax in (2 * nside, 3 * nside - 1):
            L = lmax + 1
            op = SHT(nside, lmax, legendre_mode="scan", fft_mode="xla")
            t = op.tables(True)
            alm = draw_alm(L)
            g = _synthesis_grid(op, t, jnp.asarray(alm))
            for name, kind, niter in methods:
                t0 = time.time()
                if kind == "jacobi":
                    a = _analysis_grid_jit(op, t, g, niter)
                else:
                    a = _analysis_cg_grid_jit(op, t, g, niter)
                row = {
                    "nside": nside,
                    "lmax": lmax,
                    "method": name,
                    "rel_full": rel_err(a, alm),
                    "rel_band": rel_err(a, alm, 2 * nside + 1),
                    "seconds": round(time.time() - t0, 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    print("\n| nside | lmax | method | rel (all l) | rel (l<=2 nside) | s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['nside']} | {r['lmax']} | {r['method']} "
            f"| {r['rel_full']:.1e} | {r['rel_band']:.1e} "
            f"| {r['seconds']} |"
        )


if __name__ == "__main__":
    main()
