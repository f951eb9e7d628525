"""Extra-galactic point source simulation.

Re-design of the reference ``cora/foreground/pointsource.py``: population
models defined by a differential source count dN/dS and a stochastic
spectral law; populations drawn with an inverse-CDF inhomogeneous Poisson
sampler in log-flux; maps painted by scatter-adding source spectra onto
random pixels; a real NVSS+VLSS catalogue for the brightest sources; and a
three-regime composite model.
"""

from __future__ import annotations

import os

import numpy as np

from ..util.compute import on_model_device

from .. import constants
from ..core import maps
from ..healpix import pixel as hpx
from . import poisson as ps
from . import gaussianfg
from . import skydata

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")


def _load_faraday():
    return skydata.load_skydata()["faraday"]


def faraday_rotate(polmap, rm_map, frequencies):
    """Faraday rotate a set of sky maps, in place.

    Parameters
    ----------
    polmap : np.ndarray[freq, pol, pixel]
        Stokes (I, Q, U[, V]) maps.
    rm_map : np.ndarray[pixel]
        Rotation measure in rad/m².
    frequencies : np.ndarray[freq]
        Frequencies in MHz.

    Notes
    -----
    Matches the reference phase convention (pointsource.py:21-51):
    the Q+iU phasor is rotated by exp(-2i·λ·RM) with λ in metres.
    """
    for ii, freq in enumerate(frequencies):
        qu = polmap[ii, 1] + 1.0j * polmap[ii, 2]
        wv = 1e-6 * constants.c / freq
        qu = qu * np.exp(-2.0j * wv * rm_map)
        polmap[ii, 1] = qu.real
        polmap[ii, 2] = qu.imag
    return polmap


class PointSourceModel(maps.Map3d):
    r"""A population of astrophysical point sources.

    Subclasses implement ``source_count`` (dN/dS per Jy per steradian) and
    ``spectral_realisation``.

    Attributes
    ----------
    flux_min, flux_max : float or None
        Flux limits in Jy; if flux_max is None a high-probability cap is
        solved for from the source counts.
    faraday : bool
        Faraday-rotate polarised maps.
    sigma_pol_frac : float
        Std-dev of the source polarisation fraction (Ricci et al. 2004).
    seed : int or None
        RNG seed for reproducible populations.
    """

    flux_min = 1e-4
    flux_max = None

    faraday = True
    sigma_pol_frac = 0.03
    seed = None

    def __init__(self):
        self._faraday = _load_faraday()

    def _rng(self):
        return np.random.default_rng(self.seed)

    def source_count(self, flux):
        """Differential source count dN/dS [Jy^-1 sr^-1] at `flux` [Jy]."""
        raise NotImplementedError

    def spectral_realisation(self, flux, frequencies, rng=None):
        """Draw per-source spectra at the given frequencies."""
        raise NotImplementedError

    def generate_population(self, area, rng=None):
        """Draw the source fluxes within `area` steradians.

        The counts model dN/dS defines an inhomogeneous Poisson process on
        flux; we sample it in u = ln(S/S_min), where the intensity picks
        up the Jacobian S and the bright power-law tail flattens enough
        for the inverse-CDF sampler's linear grid (same process as
        reference pointsource.py:131-173, via P(u) du = P(S) dS).  When no
        explicit upper limit is set, cap where the expected number of
        brighter sources falls to 0.05 — i.e. a ~5% chance of even one
        source above the cut.
        """
        rng = rng if rng is not None else self._rng()
        smin = self.flux_min

        def expected_above(s):
            # local power-law estimate: N(>S) ≈ S·(dN/dS)/(β−1) ~ S·dN/dS
            return area * s * self.source_count(s)

        smax = self.flux_max
        if smax is None:
            from scipy.optimize import newton

            smax = newton(lambda s: expected_above(s) - 0.05, smin)

        u = ps.inhomogeneous_process_approx(
            np.log(smax / smin),
            lambda u: expected_above(smin * np.exp(u)),
            rng=rng,
        )
        return smin * np.exp(u)

    def getfield(self, catalogue=False):
        """Flat-sky cube of point sources [freq, x, y]."""
        rng = self._rng()
        c = np.zeros(self._num_array())

        fluxes = self.generate_population(
            np.radians(self.x_width) * np.radians(self.y_width), rng=rng
        )
        freq = self.nu_pixels
        sr = self.spectral_realisation(
            fluxes[:, np.newaxis], freq[np.newaxis, :], rng=rng
        )

        # vectorised scatter-add onto random pixels
        x = rng.integers(0, self.x_num, sr.shape[0])
        y = rng.integers(0, self.y_num, sr.shape[0])
        flat = np.zeros((self.nu_num, self.x_num * self.y_num))
        np.add.at(flat.T, x * self.y_num + y, sr)
        c = flat.reshape(self.nu_num, self.x_num, self.y_num)

        if not catalogue:
            return c
        return c, fluxes

    @on_model_device
    def getsky(self):
        """Full-sky brightness-temperature maps [freq, pix] in K."""
        rng = self._rng()
        npix = 12 * self.nside**2
        freq = self.nu_pixels
        nfreq = len(freq)
        pxarea = 4 * np.pi / npix

        fluxes = self.generate_population(4 * np.pi, rng=rng)
        sr = self.spectral_realisation(
            fluxes[:, np.newaxis], freq[np.newaxis, :], rng=rng
        )

        # scatter-add each source onto a random pixel (vectorised over the
        # population, replacing the reference's per-source Python loop)
        ix = rng.integers(0, npix, sr.shape[0])
        sky = np.zeros((nfreq, npix), dtype=np.float64)
        np.add.at(sky.T, ix, sr)

        # flux [Jy] -> brightness temperature [K]
        sky *= (
            1e-26
            * constants.c**2
            / (2 * constants.k_B * freq[:, np.newaxis] ** 2 * 1e12 * pxarea)
        )
        return sky

    @on_model_device
    def getpolsky(self):
        """Polarised point sources (random pol fraction + Faraday screen)."""
        rng = self._rng()
        sky_I = self.getsky()

        sky_pol = np.zeros((sky_I.shape[0], 4, sky_I.shape[1]), dtype=sky_I.dtype)
        q_frac = self.sigma_pol_frac * rng.standard_normal(sky_I.shape[1])
        u_frac = self.sigma_pol_frac * rng.standard_normal(sky_I.shape[1])

        sky_pol[:, 0] = sky_I
        sky_pol[:, 1] = sky_I * q_frac[np.newaxis, :]
        sky_pol[:, 2] = sky_I * u_frac[np.newaxis, :]

        if self.faraday:
            faraday_rotate(
                sky_pol, hpx.ud_grade(self._faraday, self.nside), self.nu_pixels
            )
        return sky_pol


class PowerLawModel(PointSourceModel):
    r"""Power-law source counts with Gaussian-distributed spectral indices.

    Source-count parameters loosely follow the 6C survey (Hales et al.
    1988); see reference pointsource.py:281-336.
    """

    source_index = 2.5
    source_pivot = 1.0
    source_amplitude = 2.396e3

    spectral_mean = -0.7
    spectral_width = 0.1
    spectral_pivot = 151.0

    def source_count(self, flux):
        return self.source_amplitude * (flux / self.source_pivot) ** (
            -self.source_index
        )

    def spectral_realisation(self, flux, freq, rng=None):
        rng = rng if rng is not None else self._rng()
        ind = self.spectral_mean + self.spectral_width * rng.standard_normal(
            flux.shape
        )
        return flux * (freq / self.spectral_pivot) ** ind


class DiMatteo(PointSourceModel):
    r"""Double power-law source counts (Di Matteo et al. 2002).

    dN/dS = k1 / ((S/S_0)^γ1 + (S/S_0)^γ2); see reference
    pointsource.py:338-394 and Santos et al. 2005 footnote 6.
    """

    gamma1 = 1.75
    gamma2 = 2.51
    S_0 = 0.88
    k1 = 1.52e3

    spectral_mean = -0.7
    spectral_width = 0.1
    spectral_pivot = 151.0

    def source_count(self, flux):
        s = flux / self.S_0
        return self.k1 / (s**self.gamma1 + s**self.gamma2)

    def spectral_realisation(self, flux, freq, rng=None):
        rng = rng if rng is not None else self._rng()
        ind = self.spectral_mean + self.spectral_width * rng.standard_normal(
            flux.shape
        )
        return flux * (freq / self.spectral_pivot) ** ind


class RealPointSources(maps.Map3d):
    r"""Maps of the real bright-source population (NVSS + VLSS catalogue).

    Sources with measured 600 MHz fluxes, quadratic log-spectra and
    measured polarisation, painted at their true positions (reference
    pointsource.py:395-523; catalogue build described in the reference's
    data notebook).
    """

    flux_min = 10.0
    flux_max = None
    spectral_pivot = 600.0
    faraday = True
    seed = None

    def __init__(self):
        self._faraday = _load_faraday()
        cat = np.load(os.path.join(_DATA_DIR, "combinedps.npz"))
        self._catalogue = {k: cat[k] for k in cat.files if k != "provenance"}

    def _generate_catalogue(self):
        flux = self._catalogue["S600"]
        mask = np.ones_like(flux, dtype=bool)
        if self.flux_max is not None:
            mask &= flux < self.flux_max
        if self.flux_min is not None:
            mask &= flux > self.flux_min
        self._mask = mask

    @on_model_device
    def getsky(self):
        return self.getpolsky()[:, 0]

    @on_model_device
    def getpolsky(self):
        """Paint real sources with their measured spectra and polarisation."""
        self._generate_catalogue()
        cat = self._catalogue
        m = self._mask

        freq = self.nu_pixels
        nfreq = len(freq)
        npix = 12 * self.nside**2
        sky = np.zeros((nfreq, 4, npix), dtype=np.float64)

        theta = np.pi / 2.0 - np.radians(cat["DEC"][m])
        phi = np.radians(cat["RA"][m])
        ix = hpx.ang2pix(self.nside, theta, phi)

        x = np.log(freq / self.spectral_pivot)[np.newaxis, :]
        flux = cat["S600"][m][:, np.newaxis]
        beta = cat["BETA"][m][:, np.newaxis]
        gamma = cat["GAMMA"][m][:, np.newaxis]
        flux_I = flux * np.exp(beta * x + gamma * x**2)  # [src, freq]

        np.add.at(sky[:, 0].T, ix, flux_I)

        polflux = cat["P600"][m]
        polang = np.radians(cat["POLANG"][m])
        has_pol = ~(np.isnan(polflux) | np.isnan(polang))
        pf = np.where(has_pol, polflux / cat["S600"][m], 0.0)[:, np.newaxis]
        cos2 = np.where(has_pol, np.cos(2 * polang), 0.0)[:, np.newaxis]
        sin2 = np.where(has_pol, np.sin(2 * polang), 0.0)[:, np.newaxis]

        np.add.at(sky[:, 1].T, ix, flux_I * pf * cos2)
        np.add.at(sky[:, 2].T, ix, flux_I * pf * sin2)

        # Jy -> K
        sky *= (
            1e-26
            * constants.c**2
            / (
                2
                * constants.k_B
                * freq[:, np.newaxis, np.newaxis] ** 2
                * 1e12
                * hpx.nside2pixarea(self.nside)
            )
        )

        if self.faraday:
            faraday_rotate(sky, hpx.ud_grade(self._faraday, self.nside), freq)
        return sky


class CombinedPointSources(maps.Map3d):
    """Three-regime composite point-source model.

    S < 0.1 Jy (151 MHz): Gaussian unresolved background;
    0.1 Jy < S < ~4 Jy: synthetic Di Matteo population;
    brighter: real NVSS/VLSS sources.  (Reference pointsource.py:526-578.)
    """

    flux_max = None
    seed = None

    class _UnresolvedBackground(gaussianfg.PointSources):
        A = 3.55e-5
        nu_0 = 408.0
        l_0 = 100.0
        oversample = 0

    class _RandomResolved(DiMatteo):
        flux_min = 0.1
        flux_max = 4.0 * (151.0 / 600.0) ** DiMatteo.spectral_mean

    class _RealResolved(RealPointSources):
        flux_min = 4.0

    @on_model_device
    def getsky(self):
        return self.getpolsky()[:, 0]

    @on_model_device
    def getpolsky(self):
        obj_unresolved = self._UnresolvedBackground.like_map(self)
        obj_random = self._RandomResolved.like_map(self)
        obj_real = self._RealResolved.like_map(self)

        if self.seed is not None:
            obj_unresolved.seed = self.seed
            obj_random.seed = self.seed + 1
            obj_real.seed = self.seed + 2

        if self.flux_max is not None:
            obj_real.flux_max = self.flux_max
            if self.flux_max < obj_random.flux_max:
                obj_random.flux_max = self.flux_max

        ps_all = obj_unresolved.getpolsky()
        ps_all += obj_random.getpolsky()
        ps_all += obj_real.getpolsky()
        return ps_all
