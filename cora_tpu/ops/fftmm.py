"""Four-step (Bailey) FFT as MXU matmuls.

The axon TPU backend rejects batched complex FFTs above length 512
("UNIMPLEMENTED"), and XLA's TPU FFT is not MXU-resident anyway.  This
module implements the DFT of length N = N1·N2 as two small-DFT matmuls and
a twiddle multiply:

    X[k1 + N1 k2] = Σ_{n2} ω_N^{n2 k1} [Σ_{n1} x[n1 N2 + n2] ω_{N1}^{n1 k1}]
                    · ω_{N2}^{n2 k2}

Both contraction steps run on the MXU (complex matmuls decompose into four
real matmuls); the twiddle is a fused elementwise multiply.  For the ring
FFT sizes used by the SHT (≤ 16384) this costs ~2·√N MACs per sample —
comfortably faster than memory-bound alternatives at batch sizes of
interest, and portable to any backend.

Twiddle matrices are precomputed host-side and passed in as device tables
(never closure constants).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _ceinsum(sub, x, W, precision, cmul="xla"):
    """Complex einsum, optionally via 3-multiplication Karatsuba.

    XLA lowers a complex dot to FOUR real dots (rr, ii, ri, ir); the
    Karatsuba/Gauss form needs THREE — p1 = xr·Wr, p2 = xi·Wi,
    p3 = (xr+xi)·(Wr+Wi); re = p1−p2, im = p3−p1−p2 — a 25% MXU-FLOP
    cut on the matmul-FFT stages at the cost of one extra elementwise
    pass over x.  The imaginary part picks up one extra rounding
    (cancellation in p3−p1−p2), same error class as the 4-dot form at
    f32; exactness vs the XLA lowering is asserted in
    tests/test_sht.py.
    """
    if cmul != "karatsuba" or not jnp.iscomplexobj(x):
        return jnp.einsum(sub, x, W, precision=precision)
    xr, xi = jnp.real(x), jnp.imag(x)
    Wr, Wi = jnp.real(W), jnp.imag(W)
    p1 = jnp.einsum(sub, xr, Wr, precision=precision)
    p2 = jnp.einsum(sub, xi, Wi, precision=precision)
    p3 = jnp.einsum(sub, xr + xi, Wr + Wi, precision=precision)
    return jax.lax.complex(p1 - p2, p3 - p1 - p2)


def _split(n):
    """Factor n = n1 * n2 with n1 + n2 minimal (n1, n2 are dense DFT
    matrix sizes, so any factorisation works — not just powers of two).

    The balanced split minimises total MACs (2·(n1+n2) per sample); a
    128-pinned n1 was measured SLOWER on v5e (the huge row batch already
    fills the MXU, so the +25% MACs of an unbalanced split are pure loss).
    Smooth (2- or 3-smooth) n gives near-square splits; the SHT only
    requests such sizes.
    """
    best = None
    d = 1
    while d * d <= n:
        if n % d == 0:
            best = d
        d += 1
    assert best is not None and best > 1 or n <= 3, (
        f"fftmm: n={n} has no nontrivial balanced factorisation"
    )
    n1 = max(best, 1)
    n2 = n // n1
    # keep n1 >= n2 (stage-1 contraction over the larger factor)
    return (n2, n1) if n1 < n2 else (n1, n2)


def dft_tables(n, dtype=np.complex64):
    """Precompute twiddle tables for forward and inverse length-n DFTs.

    Returns a dict of host numpy arrays: W1 [n1, n1], T [n1, n2], W2
    [n2, n2] for each direction.
    """
    n1, n2 = _split(n)
    j1 = np.arange(n1)
    j2 = np.arange(n2)

    tabs = {}
    for sign, name in [(-1.0, "fwd"), (+1.0, "inv")]:
        w_n = np.exp(sign * 2j * np.pi / n)
        w1 = np.exp(sign * 2j * np.pi / n1)
        w2 = np.exp(sign * 2j * np.pi / n2)
        tabs[name] = dict(
            W1=(w1 ** (j1[:, None] * j1[None, :])).astype(dtype),  # [n1, k1]
            T=(w_n ** (j1[:, None] * j2[None, :])).astype(dtype),  # [k1, n2]
            W2=(w2 ** (j2[:, None] * j2[None, :])).astype(dtype),  # [n2, k2]
        )
    tabs["n"] = n
    tabs["n1n2"] = (n1, n2)
    return tabs


def _apply(x, tab, n1, n2, precision="highest", in_len=None, out_len=None,
           cmul="xla"):
    """One DFT direction over the last axis of x (length n1*n2).

    ``precision`` guards against TPU bf16 matmul passes: FFT twiddle
    contractions are precision-critical (the SHT accuracy contract is
    1e-5 map RMS; bf16 default gives ~5e-3).

    ``in_len``: statically-known count of (leading) nonzero input samples —
    the stage-1 contraction skips the all-zero trailing rows of the
    [n1, n2] reshape.  ``out_len``: only outputs [0, out_len) are needed —
    the stage-2 contraction computes k2 < ceil(out_len/n1) columns only
    (output index is k1 + n1·k2) and the result is zero-padded back.
    Both are pure matmul-shape reductions (Bluestein convolutions feed
    zero-padded chirps and slice short windows, so ~40% of the work is
    structurally void without these hints).
    """
    shape = x.shape
    xr = x.reshape(shape[:-1] + (n1, n2))
    W1 = tab["W1"]
    if in_len is not None and in_len < n1 * n2:
        n1v = -(-in_len // n2)
        xr = xr[..., :n1v, :]
        W1 = W1[:n1v, :]
    # step 1: DFT over n1 → A[k1, n2]
    A = _ceinsum("...nj,nk->...kj", xr, W1, precision, cmul)
    # step 2: twiddle
    A = A * tab["T"]
    W2 = tab["W2"]
    n2v = n2
    if out_len is not None and out_len < n1 * n2:
        n2v = -(-out_len // n1)
        W2 = W2[:, :n2v]
    # step 3: DFT over n2 → Y[k1, k2]
    Y = _ceinsum("...kj,jl->...kl", A, W2, precision, cmul)
    # output ordering: X[k1 + n1*k2] → transpose to [k2, k1]
    out = jnp.swapaxes(Y, -1, -2).reshape(shape[:-1] + (n1 * n2v,))
    if n2v != n2:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, n1 * (n2 - n2v))])
    return out


def fft_mm(x, tabs):
    """Forward DFT over the last axis using precomputed tables."""
    n1, n2 = tabs["n1n2"]
    t = {k: jnp.asarray(v) for k, v in tabs["fwd"].items()}
    return _apply(x, t, n1, n2)


def ifft_mm(x, tabs):
    """Inverse DFT (normalised by 1/n) over the last axis."""
    n1, n2 = tabs["n1n2"]
    t = {k: jnp.asarray(v) for k, v in tabs["inv"].items()}
    return _apply(x, t, n1, n2) / tabs["n"]
