"""Generate a synthetic `skydata.npz` (Haslam / spectral-index / Faraday maps).

The reference package requires a large data blob `skydata.npz` holding the
destriped Haslam 408 MHz map, three spectral-index maps (Miville-Deschenes,
GSM-derived, Giardino) and a galactic rotation-measure map
(reference galaxy.py:114-131, pointsource.py:86-88).  That blob is stripped
from the reference checkout (.MISSING_LARGE_BLOBS), so this script
regenerates *statistically realistic synthetic stand-ins*:

- ``haslam``: log-normal synchrotron sky with a bright galactic plane and
  power-law angular fluctuations, scaled to the observed 408 MHz brightness
  range (high-latitude ~20 K, plane several hundred K);
- ``spectral_{md,gsm,gd}``: spectral-index maps β ≈ -2.8 with smooth ~0.1
  spatial variations (each variant a different realisation/offset);
- ``faraday``: rotation measure map with plane-enhanced variance
  (|RM| ~ few rad/m² at the poles, ~100 in the plane).

All maps are deterministic (fixed seeds) at nside=256, RING ordering,
galactic coordinates.  Swap in the real data by replacing the arrays in
``cora_tpu/data/skydata.npz`` with identical keys.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

from cora_tpu.core import skysim
from cora_tpu.healpix import pixel

NSIDE = 256
OUT = os.path.join(os.path.dirname(__file__), "..", "cora_tpu", "data")


def grf(nside, beta, lmax=None, seed=0):
    """Unit-variance Gaussian random field with C_l ∝ l^-beta."""
    if lmax is None:
        lmax = 3 * nside - 1
    l = np.arange(lmax + 1, dtype=np.float64)
    cl = np.where(l < 1, 0.0, np.where(l < 1, 1.0, l) ** -beta)
    cl[1:] = l[1:] ** -beta
    corr = cl[:, None, None] * np.ones((1, 1, 1))
    m = skysim.mkfullsky(corr, nside, key=jax.random.PRNGKey(seed))[0]
    return m / m.std()


def main():
    npix = pixel.nside2npix(NSIDE)
    theta, phi = pixel.pix2ang(NSIDE, np.arange(npix))
    b = 90.0 - np.degrees(theta)  # galactic latitude (maps are galactic)

    # --- Haslam 408 MHz ---
    # Grounded against the published destriped map (Remazeilles et al.
    # 2015; docs/skydata.md): zero level ≈ 8.7 K (CMB 2.73 K +
    # extragalactic background), high-|b| median ≈ 20 K, minimum ≈ 13 K,
    # plane ridge hundreds of K.
    plane = np.exp(-0.5 * (b / 5.0) ** 2)
    # The real plane ridge brightens strongly toward the inner galaxy
    # (|l| ≲ 60°) and fades toward the anticentre — a uniform ridge
    # overweights the plane in the full-sky variance.
    l_gal = np.degrees(phi)
    l_wrap = np.minimum(l_gal, 360.0 - l_gal)
    lon_prof = 0.18 + 0.82 * np.exp(-0.5 * (l_wrap / 55.0) ** 2)
    fluct = grf(NSIDE, 2.8, seed=1)
    base = 11.0 + 260.0 * lon_prof * plane * (1.0 + 0.5 * np.tanh(fluct))
    haslam = 8.7 + base * np.exp(0.45 * grf(NSIDE, 2.6, seed=2))
    haslam = haslam.astype(np.float32)

    # --- spectral index maps (values ~ -2.8 ± 0.15, plane slightly flatter)
    def spec_map(seed, mean, amp):
        g = grf(NSIDE, 3.0, seed=seed)
        return (mean + 0.12 * plane + amp * g).astype(np.float32)

    spectral_md = spec_map(3, -2.80, 0.08)
    spectral_gsm = spec_map(4, -2.85, 0.10)
    spectral_gd = spec_map(5, -2.75, 0.07)

    # --- Faraday rotation measure map [rad/m^2] ---
    # Grounded against RM-catalogue statistics (Taylor et al. 2009;
    # Oppermann et al. 2012; docs/skydata.md): σ_RM ≈ 6-15 rad/m² at
    # high latitude, ~100+ towards the plane.
    g1 = grf(NSIDE, 2.4, seed=6)
    g2 = grf(NSIDE, 2.2, seed=7)
    sigma_rm = 8.5 + 100.0 * np.exp(-0.5 * (b / 8.0) ** 2)
    faraday = (sigma_rm * g1 + 3.0 * g2).astype(np.float32)

    np.savez(
        os.path.join(OUT, "skydata.npz"),
        haslam=haslam,
        spectral_md=spectral_md,
        spectral_gsm=spectral_gsm,
        spectral_gd=spectral_gd,
        faraday=faraday,
        nside=NSIDE,
        provenance=(
            "synthetic regeneration (tools/make_skydata.py); the upstream "
            "skydata.npz blob is stripped from the reference checkout"
        ),
    )
    print("haslam std:", haslam.std(), "mean:", haslam.mean())
    print("faraday std:", faraday.std())
    print("wrote", os.path.join(OUT, "skydata.npz"))


if __name__ == "__main__":
    main()
