"""HEALPix RING/NEST pixelisation — native implementation.

Replaces healpy's pixel-geometry surface used throughout the reference
(pix2ang/ang2pix/pix2vec/get_interp_val/get_all_neighbours/ud_grade/reorder;
see reference cora/util/hputil.py and call sites in galaxy.py, pointsource.py,
lss.py).  Algorithms follow the standard HEALPix definitions (Górski et al.
2005); everything is vectorised index arithmetic with no per-pixel loops.

Host paths are numpy float64; the jittable in-graph variants (ang2pix used
by the SPH gridder) live in :func:`cora_tpu.ops.pmesh.ang2pix_ring_jax`.
"""

from __future__ import annotations

import numpy as np


def nside2npix(nside: int) -> int:
    return 12 * nside * nside


def npix2nside(npix: int) -> int:
    nside = int(round(np.sqrt(npix / 12.0)))
    if 12 * nside * nside != npix:
        raise ValueError(f"npix={npix} is not a valid HEALPix pixel count")
    return nside


def nside2pixarea(nside: int) -> float:
    return 4 * np.pi / nside2npix(nside)


def nside2resol(nside: int) -> float:
    return float(np.sqrt(nside2pixarea(nside)))


def _ncap(nside: int) -> int:
    return 2 * nside * (nside - 1)


def ring_info(nside: int):
    """Geometry of the 4*nside - 1 iso-latitude rings (north to south).

    Returns
    -------
    dict with arrays over rings (index 0 = northernmost):
      ``theta``  colatitude of the ring centre,
      ``cth``/``sth``  cos/sin of theta,
      ``nphi``   number of pixels in the ring,
      ``phi0``   azimuth of the first pixel centre,
      ``start``  RING index of the first pixel in the ring.
    """
    nring = 4 * nside - 1
    i = np.arange(1, nring + 1)  # 1-based ring number

    nphi = np.where(
        i < nside, 4 * i, np.where(i <= 3 * nside, 4 * nside, 4 * (4 * nside - i))
    )

    z = np.empty(nring)
    north = i < nside
    eq = (i >= nside) & (i <= 3 * nside)
    south = i > 3 * nside
    z[north] = 1.0 - (i[north] ** 2) / (3.0 * nside**2)
    z[eq] = 4.0 / 3.0 - 2.0 * i[eq] / (3.0 * nside)
    i_s = 4 * nside - i[south]
    z[south] = -(1.0 - (i_s**2) / (3.0 * nside**2))

    phi0 = np.empty(nring)
    phi0[north] = np.pi / (4.0 * i[north])  # half-pixel offset
    s = (i[eq] - nside + 1) % 2
    phi0[eq] = s * np.pi / (4.0 * nside)
    phi0[south] = np.pi / (4.0 * i_s)

    start = np.concatenate([[0], np.cumsum(nphi)[:-1]]).astype(np.int64)

    theta = np.arccos(z)
    return dict(
        theta=theta,
        cth=z,
        sth=np.sqrt((1.0 - z) * (1.0 + z)),
        nphi=nphi.astype(np.int64),
        phi0=phi0,
        start=start,
    )


def pix2ring(nside: int, ipix):
    """Ring number (1-based) containing each RING-scheme pixel."""
    ipix = np.asarray(ipix, dtype=np.int64)
    npix = nside2npix(nside)
    ncap = _ncap(nside)

    out = np.empty_like(ipix)

    # North cap
    m = ipix < ncap
    ph = (ipix[m] + 1) / 2.0
    out[m] = (np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1

    # Equatorial
    m = (ipix >= ncap) & (ipix < npix - ncap)
    out[m] = (ipix[m] - ncap) // (4 * nside) + nside

    # South cap
    m = ipix >= npix - ncap
    prev = npix - 1 - ipix[m]
    ph = (prev + 1) / 2.0
    irs = (np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
    out[m] = 4 * nside - irs

    return out


def pix2ang(nside: int, ipix):
    """(theta, phi) of RING pixel centres."""
    ipix = np.atleast_1d(np.asarray(ipix, dtype=np.int64))
    npix = nside2npix(nside)
    ncap = _ncap(nside)

    theta = np.empty(ipix.shape, dtype=np.float64)
    phi = np.empty(ipix.shape, dtype=np.float64)

    # North polar cap
    m = ipix < ncap
    if m.any():
        p = ipix[m]
        ph = (p + 1) / 2.0
        i = (np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
        j = p + 1 - 2 * i * (i - 1)
        theta[m] = np.arccos(1.0 - i**2 / (3.0 * nside**2))
        phi[m] = (j - 0.5) * np.pi / (2.0 * i)

    # Equatorial belt
    m = (ipix >= ncap) & (ipix < npix - ncap)
    if m.any():
        p = ipix[m] - ncap
        i = p // (4 * nside) + nside
        j = p % (4 * nside) + 1
        s = (i - nside + 1) % 2
        theta[m] = np.arccos(4.0 / 3.0 - 2.0 * i / (3.0 * nside))
        phi[m] = (j - 1.0 + s / 2.0) * np.pi / (2.0 * nside)

    # South polar cap
    m = ipix >= npix - ncap
    if m.any():
        p = npix - 1 - ipix[m]
        ph = (p + 1) / 2.0
        i = (np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
        j = p + 1 - 2 * i * (i - 1)
        j = 4 * i + 1 - j
        theta[m] = np.arccos(-(1.0 - i**2 / (3.0 * nside**2)))
        phi[m] = (j - 0.5) * np.pi / (2.0 * i)

    return theta, phi


def ang2pix(nside: int, theta, phi):
    """RING pixel containing each (theta, phi)."""
    theta = np.atleast_1d(np.asarray(theta, dtype=np.float64))
    phi = np.atleast_1d(np.asarray(phi, dtype=np.float64))
    theta, phi = np.broadcast_arrays(theta, phi)

    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2 * np.pi) / (0.5 * np.pi)  # in [0, 4)

    pix = np.empty(z.shape, dtype=np.int64)
    npix = nside2npix(nside)
    ncap = _ncap(nside)

    # Equatorial region
    m = za <= 2.0 / 3.0
    if m.any():
        temp1 = nside * (0.5 + tt[m])
        temp2 = nside * 0.75 * z[m]
        jp = (temp1 - temp2).astype(np.int64)  # ascending edge line index
        jm = (temp1 + temp2).astype(np.int64)  # descending edge line index

        ir = nside + 1 + jp - jm  # ring number counted from z = 2/3: 1..2n+1
        kshift = 1 - (ir & 1)

        ip = (jp + jm - nside + kshift + 1) // 2
        ip = np.mod(ip, 4 * nside)

        pix[m] = ncap + (ir - 1) * 4 * nside + ip

    # Polar caps
    m = ~m
    if m.any():
        tp = tt[m] - np.floor(tt[m])
        tmp = nside * np.sqrt(3.0 * (1.0 - za[m]))

        jp = (tp * tmp).astype(np.int64)
        jm = ((1.0 - tp) * tmp).astype(np.int64)

        ir = jp + jm + 1  # ring number counted from the closest pole
        ip = (tt[m] * ir).astype(np.int64)
        ip = np.mod(ip, 4 * ir)

        north = z[m] > 0
        pp = np.empty(ir.shape, dtype=np.int64)
        pp[north] = 2 * ir[north] * (ir[north] - 1) + ip[north]
        pp[~north] = npix - 2 * ir[~north] * (ir[~north] + 1) + ip[~north]
        pix[m] = pp

    return pix


def ang2vec(theta, phi):
    theta = np.asarray(theta, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], axis=-1)


def vec2ang(vec):
    vec = np.asarray(vec, dtype=np.float64)
    norm = np.sqrt((vec**2).sum(axis=-1))
    theta = np.arccos(np.clip(vec[..., 2] / norm, -1.0, 1.0))
    phi = np.mod(np.arctan2(vec[..., 1], vec[..., 0]), 2 * np.pi)
    return theta, phi


def pix2vec(nside: int, ipix):
    theta, phi = pix2ang(nside, ipix)
    v = ang2vec(theta, phi)
    return v[..., 0], v[..., 1], v[..., 2]


def vec2pix(nside: int, x, y, z):
    theta, phi = vec2ang(np.stack(np.broadcast_arrays(x, y, z), axis=-1))
    return ang2pix(nside, theta, phi)


# ---------------------------------------------------------------------------
# NEST ordering
# ---------------------------------------------------------------------------

def _compress_bits(v):
    """Extract even bits of a 64-bit integer array (inverse of spread)."""
    v = v & 0x5555555555555555
    v = (v | (v >> 1)) & 0x3333333333333333
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
    v = (v | (v >> 16)) & 0x00000000FFFFFFFF
    return v


def _spread_bits(v):
    """Spread the low 32 bits of an integer array into even bit positions."""
    v = v & 0x00000000FFFFFFFF
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


# Face geometry constants (standard HEALPix face layout).
_JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4])
_JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7])


def nest2ring(nside: int, ipnest):
    """Convert NESTED pixel indices to RING indices."""
    if nside & (nside - 1):
        raise ValueError("nest ordering requires power-of-two nside")
    ipnest = np.atleast_1d(np.asarray(ipnest, dtype=np.int64))

    npface = nside * nside
    face = ipnest // npface
    p = ipnest % npface

    ix = _compress_bits(p)
    iy = _compress_bits(p >> 1)

    jr = _JRLL[face] * nside - ix - iy - 1  # ring number 1..4nside-1

    npix = nside2npix(nside)
    ncap = _ncap(nside)

    nr = np.empty_like(jr)
    kshift = np.empty_like(jr)
    n_before = np.empty_like(jr)

    m = jr < nside  # north cap
    nr[m] = jr[m]
    n_before[m] = 2 * nr[m] * (nr[m] - 1)
    kshift[m] = 0

    m = (jr >= nside) & (jr <= 3 * nside)  # equatorial
    nr[m] = nside
    n_before[m] = ncap + (jr[m] - nside) * 4 * nside
    kshift[m] = (jr[m] - nside) & 1

    m = jr > 3 * nside  # south cap
    nr[m] = 4 * nside - jr[m]
    n_before[m] = npix - 2 * nr[m] * (nr[m] + 1)
    kshift[m] = 0

    jp = (_JPLL[face] * nr + ix - iy + 1 + kshift) // 2
    jp = np.where(jp > 4 * nr, jp - 4 * nr, jp)
    jp = np.where(jp < 1, jp + 4 * nr, jp)

    return n_before + jp - 1


def ring2nest(nside: int, ipring):
    """Convert RING pixel indices to NESTED indices."""
    if nside & (nside - 1):
        raise ValueError("nest ordering requires power-of-two nside")
    ipring = np.atleast_1d(np.asarray(ipring, dtype=np.int64))

    npix = nside2npix(nside)
    ncap = _ncap(nside)

    jr = np.empty_like(ipring)  # ring number
    jp = np.empty_like(ipring)  # index in ring, 1-based
    kshift = np.empty_like(ipring)
    nr = np.empty_like(ipring)

    m = ipring < ncap  # north cap
    ph = (ipring[m] + 1) / 2.0
    irn = (np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
    jr[m] = irn
    jp[m] = ipring[m] + 1 - 2 * irn * (irn - 1)
    kshift[m] = 0
    nr[m] = irn

    m = (ipring >= ncap) & (ipring < npix - ncap)  # equatorial
    ip = ipring[m] - ncap
    irn = ip // (4 * nside) + nside
    jr[m] = irn
    jp[m] = ip % (4 * nside) + 1
    kshift[m] = (irn - nside) & 1
    nr[m] = nside

    m = ipring >= npix - ncap  # south cap
    ip = npix - ipring[m]
    irs = (np.sqrt(ip / 2.0 - np.sqrt(np.floor(ip / 2.0)))).astype(np.int64) + 1
    jr[m] = 4 * nside - irs
    jp[m] = 4 * irs + 1 - (ip - 2 * irs * (irs - 1))
    kshift[m] = 0
    nr[m] = irs

    # Face number
    ire = jr - nside + 1  # in {-(nside-2) .. 3nside+1}
    irm = 2 * nside + 2 - ire
    ifm = (jp - (ire // 2) + nside - 1) // nside
    ifp = (jp - (irm // 2) + nside - 1) // nside

    face = np.empty_like(ipring)
    m_n = jr < nside
    m_s = jr > 3 * nside
    m_e = ~(m_n | m_s)

    face[m_n] = (jp[m_n] - 1) // nr[m_n]
    face[m_s] = 8 + (jp[m_s] - 1) // nr[m_s]
    fe = np.where(
        ifp[m_e] == ifm[m_e],
        np.mod(ifp[m_e], 4) + 4,
        np.where(ifp[m_e] < ifm[m_e], np.mod(ifp[m_e], 4), np.mod(ifm[m_e], 4) + 8),
    )
    face[m_e] = fe

    irt = jr - _JRLL[face] * nside + 1  # in {-nside+1 .. 0}
    ipt = 2 * jp - _JPLL[face] * nr - kshift - 1
    ipt = np.where(ipt >= 2 * nside, ipt - 8 * nside, ipt)

    ix = (ipt - irt) // 2
    iy = (-ipt - irt) // 2

    return face * nside * nside + _spread_bits(ix) + (_spread_bits(iy) << 1)


def reorder(map_in, r2n=False, n2r=False, inp=None, out=None):
    """Reorder a map between RING and NESTED schemes (healpy-compatible)."""
    map_in = np.asarray(map_in)
    nside = npix2nside(map_in.shape[-1])
    if inp is not None or out is not None:
        r2n = (inp, out) == ("RING", "NESTED")
        n2r = (inp, out) == ("NESTED", "RING")
    if r2n:
        idx = nest2ring(nside, np.arange(map_in.shape[-1]))
    elif n2r:
        idx = ring2nest(nside, np.arange(map_in.shape[-1]))
    else:
        raise ValueError("specify either r2n or n2r")
    return map_in[..., idx]


def ud_grade(map_in, nside_out, order_in="RING", power=None):
    """Up/downgrade map resolution (healpy-compatible; RING in/out).

    Downgrading averages child pixels; upgrading replicates parents.
    ``power`` scales values by (nside_in/nside_out)**power as in healpy.
    """
    map_in = np.asarray(map_in)
    nside_in = npix2nside(map_in.shape[-1])

    if order_in.upper().startswith("RING"):
        m_nest = reorder(map_in, r2n=True)
    else:
        m_nest = map_in

    if nside_out < nside_in:
        rat = (nside_in // nside_out) ** 2
        m_out = m_nest.reshape(m_nest.shape[:-1] + (-1, rat)).mean(axis=-1)
    elif nside_out > nside_in:
        rat = (nside_out // nside_in) ** 2
        m_out = np.repeat(m_nest, rat, axis=-1)
    else:
        m_out = m_nest

    if power is not None:
        m_out = m_out * (nside_in / nside_out) ** power

    if order_in.upper().startswith("RING"):
        m_out = reorder(m_out, n2r=True)
    return m_out


# ---------------------------------------------------------------------------
# Interpolation and neighbours
# ---------------------------------------------------------------------------

def get_interp_weights(nside: int, theta, phi):
    """Bilinear-on-sphere interpolation: 4 pixels + weights per direction.

    Follows the standard HEALPix ``get_interpol``: two pixels on the ring
    above and two on the ring below, linear in phi along each ring and
    linear in z between rings; at the poles the missing ring is replaced by
    the same ring rotated by pi.

    Returns
    -------
    pixels : np.ndarray[4, n]
    weights : np.ndarray[4, n]
    """
    theta = np.atleast_1d(np.asarray(theta, dtype=np.float64))
    phi = np.atleast_1d(np.asarray(phi, dtype=np.float64))
    theta, phi = np.broadcast_arrays(theta, phi)
    n = theta.size
    theta = theta.ravel()
    phi = np.mod(phi.ravel(), 2 * np.pi)

    info = ring_info(nside)
    ring_z = info["cth"]
    nring = ring_z.size

    z = np.cos(theta)
    # i1: index (0-based) of ring above (z_ring >= z); rings sorted descending z
    i2 = np.searchsorted(-ring_z, -z)  # first ring with z_ring <= z
    i1 = i2 - 1

    pix = np.zeros((4, n), dtype=np.int64)
    wgt = np.zeros((4, n), dtype=np.float64)

    def ring_pair(iring, ph):
        """Adjacent pixels + phi weights on ring `iring` (0-based, clipped)."""
        ir = np.clip(iring, 0, nring - 1)
        nr = info["nphi"][ir]
        p0 = info["phi0"][ir]
        st = info["start"][ir]
        dphi = 2 * np.pi / nr
        t = (ph - p0) / dphi
        j = np.floor(t).astype(np.int64)
        frac = t - j
        jm = np.mod(j, nr)
        jp1 = np.mod(j + 1, nr)
        return st + jm, st + jp1, 1.0 - frac, frac

    inside = (i1 >= 0) & (i2 <= nring - 1)

    # Generic case
    pa, pb, wa, wb = ring_pair(i1, phi)
    pc, pd, wc, wd = ring_pair(i2, phi)
    z1 = ring_z[np.clip(i1, 0, nring - 1)]
    z2 = ring_z[np.clip(i2, 0, nring - 1)]
    with np.errstate(divide="ignore", invalid="ignore"):
        wz = np.where(z1 != z2, (z1 - z) / (z1 - z2), 0.0)

    pix[0], pix[1] = pa, pb
    pix[2], pix[3] = pc, pd
    wgt[0], wgt[1] = wa * (1 - wz), wb * (1 - wz)
    wgt[2], wgt[3] = wc * wz, wd * wz

    # North pole: no ring above ring 0
    m = i1 < 0
    if m.any():
        pc_, pd_, wc_, wd_ = ring_pair(np.zeros(m.sum(), dtype=np.int64), phi[m])
        # replacement "ring above": same ring, phi + pi
        pa_, pb_, wa_, wb_ = ring_pair(
            np.zeros(m.sum(), dtype=np.int64), np.mod(phi[m] + np.pi, 2 * np.pi)
        )
        z1_ = 1.0
        z2_ = ring_z[0]
        wz_ = (z1_ - z[m]) / (z1_ - z2_)
        pix[0, m], pix[1, m] = pa_, pb_
        pix[2, m], pix[3, m] = pc_, pd_
        wgt[0, m], wgt[1, m] = wa_ * (1 - wz_), wb_ * (1 - wz_)
        wgt[2, m], wgt[3, m] = wc_ * wz_ + (1 - wz_) / 2 * 0, wd_ * wz_

        # healpy normalises so the 4 weights sum to 1; fold the "phantom"
        # upper-ring weight back onto the real ring.
        tot = wgt[:, m].sum(axis=0)
        wgt[:, m] /= tot

    # South pole: no ring below
    m = i2 > nring - 1
    if m.any():
        last = np.full(m.sum(), nring - 1, dtype=np.int64)
        pa_, pb_, wa_, wb_ = ring_pair(last, phi[m])
        pc_, pd_, wc_, wd_ = ring_pair(last, np.mod(phi[m] + np.pi, 2 * np.pi))
        z1_ = ring_z[-1]
        z2_ = -1.0
        wz_ = (z1_ - z[m]) / (z1_ - z2_)
        pix[0, m], pix[1, m] = pa_, pb_
        pix[2, m], pix[3, m] = pc_, pd_
        wgt[0, m], wgt[1, m] = wa_ * (1 - wz_), wb_ * (1 - wz_)
        wgt[2, m], wgt[3, m] = wc_ * wz_, wd_ * wz_
        tot = wgt[:, m].sum(axis=0)
        wgt[:, m] /= tot

    return pix, wgt


def get_interp_val(m, theta, phi):
    """Interpolate map values at (theta, phi) directions."""
    m = np.asarray(m)
    nside = npix2nside(m.shape[-1])
    pix, wgt = get_interp_weights(nside, theta, phi)
    return (m[..., pix] * wgt).sum(axis=-2)


def get_all_neighbours(nside: int, theta, phi=None):
    """The 8 nearest-neighbour pixels, ordered (SW, W, NW, N, NE, E, SE, S).

    Accepts pixel indices (phi=None) or angles.  Constructed from ring
    geometry: the adjacent pixels on the same ring plus the two nearest
    pixels on each adjacent ring and (where present) the directly-aligned
    vertical neighbours; -1 marks missing entries (HEALPix pixels can have
    only 7 distinct neighbours).  The neighbour *set* matches HEALPix
    adjacency; ordering is by compass direction.
    """
    if phi is None:
        ipix = np.atleast_1d(np.asarray(theta, dtype=np.int64))
    else:
        ipix = np.atleast_1d(ang2pix(nside, theta, phi))

    info = ring_info(nside)
    nring = info["theta"].size
    starts = info["start"]
    nphis = info["nphi"]
    phi0s = info["phi0"]

    r = pix2ring(nside, ipix) - 1  # 0-based ring index
    j = ipix - starts[r]
    nr = nphis[r]
    phip = phi0s[r] + j * (2 * np.pi / nr)

    n = ipix.size
    nbr = np.full((8, n), -1, dtype=np.int64)

    # Same-ring neighbours: W (index -1) and E (index +1)
    nbr[1] = starts[r] + np.mod(j - 1, nr)
    nbr[5] = starts[r] + np.mod(j + 1, nr)

    def ring_neighbours(ring_idx, ph):
        """(pix_floor, pix_ceil, aligned) nearest pixels on given rings.

        aligned is True where ph coincides with a pixel centre, in which
        case pix_floor is the aligned pixel and pix_ceil its E neighbour.
        """
        ir = np.clip(ring_idx, 0, nring - 1)
        nrr = nphis[ir]
        t = (ph - phi0s[ir]) / (2 * np.pi / nrr)
        tf = np.floor(t + 1e-9).astype(np.int64)
        aligned = np.abs(t - np.round(t)) < 1e-7
        jf = np.mod(tf, nrr)
        jc = np.mod(tf + 1, nrr)
        return starts[ir] + jf, starts[ir] + jc, aligned

    # Ring above (towards the north pole)
    above = r - 1
    m = above >= 0
    if m.any():
        pf, pc, al = ring_neighbours(above[m], phip[m])
        # aligned -> N neighbour; else NW/NE pair
        nbr[3, m] = np.where(al, pf, -1)
        nbr[2, m] = np.where(al, -1, pf)
        nbr[4, m] = np.where(al, -1, pc)
    # Across the north pole: the pixel on the same ring at phi + pi
    m = ~m
    if m.any():
        nrr = nphis[0]
        jN = np.mod(j[m] + nrr // 2, nrr)
        nbr[3, m] = starts[0] + jN

    # Ring below (towards the south pole)
    below = r + 1
    m = below <= nring - 1
    if m.any():
        pf, pc, al = ring_neighbours(below[m], phip[m])
        nbr[7, m] = np.where(al, pf, -1)
        nbr[0, m] = np.where(al, -1, pf)
        nbr[6, m] = np.where(al, -1, pc)
    m = ~m
    if m.any():
        nrr = nphis[nring - 1]
        jS = np.mod(j[m] + nrr // 2, nrr)
        nbr[7, m] = starts[nring - 1] + jS

    # In the polar caps adjacent rings change length, so a pixel can have an
    # extra aligned-vertical neighbour captured above; additionally the
    # corner pixels of cap rings touch three pixels on the longer ring.
    # For SPH-kernel use the 8-set above is the correct support; exact
    # corner triple-adjacency is refined here for cap rings.
    return nbr
