"""Galactic synchrotron emission models.

Re-design of the reference ``cora/foreground/galaxy.py``: full-sky SCK
synchrotron amplitudes (La Porta et al. 2008), and the Haslam-constrained
``ConstrainedGalaxy`` with spatially varying spectral index, variance-map
modulated fluctuations, and a Faraday-screen polarised sky.

The TPU-native win here is the polarised path: the reference synthesises
1000 complex maps one at a time through healpy (galaxy.py:260-267); here
the whole φ-conjugate screen is one batched device synthesis.
"""

from __future__ import annotations

import os

import numpy as np

from ..util.compute import on_model_device
import jax
import jax.numpy as jnp

from ..core import maps, skysim
from ..healpix import pixel as hpx
from ..healpix import sht as _sht
from ..healpix import transforms as hputil
from . import gaussianfg
from . import skydata

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")


class FullSkySynchrotron(gaussianfg.Synchrotron):
    """Synchrotron amplitudes matched to La Porta et al. 2008 (|b| > 5°)."""

    A = 6.6e-3
    beta = 2.8
    nu_0 = 408.0
    l_0 = 100.0


class FullSkyPolarisedSynchrotron(gaussianfg.Synchrotron):
    """Polarised synchrotron: pol fraction 0.5, reduced correlation length
    (ζ=0.04 from RM=16.7; Taylor et al. 2009)."""

    A = 1.65e-3
    beta = 2.8
    nu_0 = 408.0
    l_0 = 100.0
    zeta = 0.04


def map_variance(input_map, nside):
    """Variance of a map within low-resolution (nside) super-pixels."""
    inp_nside = hpx.npix2nside(np.asarray(input_map).shape[-1])
    map_nest = hpx.reorder(np.asarray(input_map), r2n=True)
    map_nest = map_nest.reshape(-1, (inp_nside // nside) ** 2)
    var_map = map_nest.var(axis=1)
    return hpx.reorder(var_map, n2r=True)


def chunk_var(a):
    """Memory-frugal variance over a large array."""
    a = np.asarray(a)
    nchunks = min(30, a.size)
    mean = a.mean()
    t = 0.0
    for sec in np.array_split(a.ravel(), nchunks):
        t += np.sum(np.abs(sec - mean) ** 2)
    return t / a.size


class ConstrainedGalaxy(maps.Sky3d):
    """Realistic galactic synchrotron simulations constrained to Haslam.

    Attributes
    ----------
    spectral_map : {'md', 'gsm', 'gd'}
        Spectral-index map variant (Miville-Deschenes 2008 default, GSM
        derived, or Giardino 2002).
    seed : int or None
        RNG seed.

    Notes
    -----
    The shipped sky maps are *synthetic statistical stand-ins* regenerated
    by tools/make_skydata.py (the upstream data blob is stripped from the
    reference checkout); to use the real Haslam/spectral/Faraday maps, point
    the ``CORA_TPU_SKYDATA`` env var at the upstream ``skydata.npz`` (the
    key schema matches — see cora_tpu.foreground.skydata).
    """

    spectral_map = "md"

    _dphi = 1.0
    _maxphi = 500.0

    @on_model_device
    def __init__(self):
        # model-device scope: the f64 smoothing/analysis here must build its
        # SHT tables on the host CPU device inside accelerator processes,
        # matching the (also model-device) getsky/getpolsky calls — mixing
        # committed devices across the cached SHT tables trips the axon
        # runtime's broken f64/complex copies.
        self._load_data()

        vm = map_variance(_sht.smoothing(self._haslam, sigma=np.radians(0.5)), 16)
        self._amp_map = np.asarray(
            _sht.smoothing(
                hpx.ud_grade(np.asarray(vm) ** 0.5, self._data_nside),
                sigma=np.radians(2.0),
            )
        )

    def _load_data(self):
        f = skydata.load_skydata()
        self._haslam = f["haslam"]
        self._sp_ind = {
            "gsm": f["spectral_gsm"],
            "md": f["spectral_md"],
            "gd": f["spectral_gd"],
        }
        self._faraday = f["faraday"]
        self._data_nside = hpx.npix2nside(self._haslam.shape[-1])

    @on_model_device
    def getsky(self, debug=False, celestial=True, key=None):
        """Realisation of the *unpolarised* sky [freq, pixel] (K).

        Haslam-constrained: random SCK fluctuations constrained to match
        the smoothed Haslam map at 408 MHz, modulated by a local variance
        map, rescaled by the spectral-index map, with tanh-linear
        positivity (reference galaxy.py:133-207).
        """
        key = self._key(key)
        haslam = hpx.ud_grade(self._haslam, self.nside)

        syn = FullSkySynchrotron()
        lmax = 3 * self.nside - 1
        efreq = np.concatenate((np.array([408.0, 1420.0]), self.nu_pixels))

        cla = skysim.clarray(syn.angular_powerspectrum, lmax, efreq, zromb=0)
        fg = skysim.mkfullsky(cla, self.nside, key=key)

        sub408 = np.asarray(_sht.smoothing(fg[0], fwhm=np.radians(1.0)))
        sub1420 = np.asarray(_sht.smoothing(fg[1], fwhm=np.radians(5.8)))

        if self.spectral_map == "gsm":
            fgs = skysim.mkconstrained(cla, [(0, sub408), (1, sub1420)], self.nside)
        else:
            fgs = skysim.mkconstrained(cla, [(0, sub408)], self.nside)

        sc = hpx.ud_grade(self._sp_ind[self.spectral_map], self.nside)
        am = hpx.ud_grade(self._amp_map, self.nside)

        vm = np.asarray(_sht.smoothing(fg[0], sigma=np.radians(0.5)))
        # variance in nside-16 super-pixels (reference galaxy.py:158);
        # clamp the window resolution so each window holds >= 4 pixels at
        # small model nside (a 1-pixel window has zero variance and the
        # amplitude normalisation below blows up)
        var_nside = min(16, self.nside // 2)
        vm = np.asarray(
            _sht.smoothing(
                map_variance(vm, var_nside) ** 0.5, sigma=np.radians(2.0)
            )
        )
        # guard against degenerate variance/base maps (possible with the
        # synthetic skydata stand-ins at low nside): 0/0 here would seed
        # NaNs through the whole cube
        mv = max(vm.mean(), 1e-30)

        fgt = (am / mv) * (fg - fgs)

        fgsmooth = haslam[np.newaxis, :] * ((efreq / 408.0)[:, np.newaxis] ** sc)

        fgt = np.where(
            np.abs(fgsmooth) > 0, fgt / np.where(fgsmooth == 0, 1.0, fgsmooth), 0.0
        )
        fgt = np.where(fgt < 0, np.tanh(fgt), fgt)
        fgt += 1
        fgt *= fgsmooth
        fgt = fgt[2:]

        if celestial:
            fgt = hputil.coord_g2c(fgt)

        if debug:
            return fgt, fg, fgs, fgsmooth, am, mv
        return fgt

    @on_model_device
    def getpolsky(self, debug=False, celestial=True, key=None):
        """Realisation of the *polarised* sky [freq, pol, pixel] (K).

        Faraday-screen model (reference galaxy.py:209-344): random emission
        in the Faraday-conjugate coordinate, Gaussian φ correlation, a
        per-pixel Faraday-depth window, the φ→frequency transfer matrix,
        tanh saturation, and modulation by the Stokes-I realisation.
        """
        key = self._key(key)
        kI, kP = jax.random.split(key)

        sigma_phi = hpx.ud_grade(
            np.asarray(_sht.smoothing(np.abs(self._faraday), fwhm=np.radians(10.0))),
            self.nside,
        )

        xiphi = 1.0
        lmax = 3 * self.nside - 1
        la = np.arange(lmax + 1, dtype=np.float64)

        def angular(l):
            safe = np.where(l == 0, 1.0e16, l)
            return (safe / 100.0) ** -2.8

        dphi = self._dphi
        maxphi = self._maxphi
        nphi = 2 * int(maxphi / dphi)
        phifreq = np.fft.fftfreq(nphi, d=(1.0 / (dphi * nphi)))

        npix = 12 * self.nside**2

        # --- batched random complex maps in the phi-conjugate coordinate.
        # The reference loops nphi inverse complex SHTs through healpy
        # (galaxy.py:260-267); here: draw full-m alm noise for all nphi
        # slices and run ONE batched complex synthesis on device.
        ps_weight = (angular(la) / 2.0) ** 0.5

        keys = jax.random.split(kP, 4)
        L = lmax + 1
        # real-field halves for real and imaginary map components
        shape = (nphi, L, L)
        wr = np.array(
            jax.random.normal(keys[0], shape) + 1j * jax.random.normal(keys[1], shape)
        )
        wi = np.array(
            jax.random.normal(keys[2], shape) + 1j * jax.random.normal(keys[3], shape)
        )
        # weight by sqrt(C_l/2) and mask to m <= l
        li = np.arange(L)[:, None]
        mi = np.arange(L)[None, :]
        mask = (mi <= li).astype(np.float64)
        wr *= ps_weight[:, None] * mask
        wi *= ps_weight[:, None] * mask

        # complex map = synth(wr) + i synth(wi); each synth treats its alm
        # as an (m>=0) half of a real field — statistically equivalent to
        # the reference's full-m complex construction.
        op = _sht.get_sht(self.nside, lmax)
        map_r = np.asarray(op.synthesis(jnp.asarray(wr)))
        map_i = np.asarray(op.synthesis(jnp.asarray(wi)))
        map2 = (map_r + 1j * map_i).T.copy()  # [npix, nphi]
        del map_r, map_i, wr, wi

        # Gaussian phi-correlation via the conjugate-space weighting
        pcfreq = np.fft.fftfreq(nphi, d=dphi)
        map2 *= np.exp(-2 * (np.pi * xiphi * pcfreq[np.newaxis, :]) ** 2)

        # FFT back into phi (blocked, in place)
        chunksize = max(npix // 12, 1)
        for si in range(0, npix, chunksize):
            map2[si : si + chunksize] = np.fft.ifft(
                map2[si : si + chunksize], axis=1
            )

        map2 /= 2.0 * chunk_var(map2) ** 0.5

        # per-pixel Faraday-depth window
        w = np.exp(-0.25 * (phifreq[np.newaxis, :] / sigma_phi[:, np.newaxis]) ** 2)
        w /= w.sum(axis=1)[:, np.newaxis]
        map2 *= w
        del w

        # phi -> frequency transfer matrix
        def ptrans(phi, freq, dfreq):
            dx = dfreq / freq
            alpha = 2.0 * phi * 3e2**2 / freq**2
            return np.exp(1.0j * alpha) * np.sinc(alpha * dx / np.pi)

        fa = self.nu_pixels
        df = np.median(np.diff(fa))
        pta = ptrans(phifreq[:, np.newaxis], fa[np.newaxis, :], df) / dphi

        map4 = np.dot(map2, pta)  # [npix, nfreq]
        del map2

        # tanh saturation of the polarisation fraction
        map4a = np.abs(map4)
        map4 = map4 * np.tanh(map4a) / np.where(map4a == 0, 1.0, map4a)
        del map4a

        map5 = np.zeros((self.nu_num, 4, npix), dtype=np.float64)
        map5[:, 0] = self.getsky(celestial=False, key=kI)
        map5[:, 1] = map4.real.T
        map5[:, 2] = map4.imag.T
        map5[:, 1:3] *= map5[:, 0, np.newaxis, :]
        del map4

        if celestial:
            map5 = hputil.coord_g2c(map5)
        return map5
