"""Build a survey-constrained ``skydata.npz`` from PUBLIC survey data.

VERDICT round-1 item 9: the upstream skydata blob (destriped Haslam 408
MHz, three spectral-index maps, a Faraday rotation-measure map — reference
galaxy.py:114-131) is stripped from the reference checkout, so cora_tpu
ships synthetic stand-ins (tools/make_skydata.py).  This script converts
the public successors of those surveys into a drop-in blob so
``cora-makesky galaxy`` produces survey-constrained skies.

Download these files on a machine with network access (this build box has
none), then run this script on them:

1. Haslam 408 MHz, destriped/desourced (Remazeilles et al. 2015):
   https://lambda.gsfc.nasa.gov/data/foregrounds/haslam_2014/haslam408_dsds_Remazeilles2014.fits
   (nside=512, RING, Kelvin)

2. Spectral index. Any of:
   * Miville-Deschenes et al. 2008 408 MHz–23 GHz index:
     https://lambda.gsfc.nasa.gov/data/foregrounds/combined_foregrounds/lambda_sfd_ebv.fits is NOT it —
     use the "Sky model of the synchrotron spectral index" product:
     https://lambda.gsfc.nasa.gov/product/foreground/fg_mdd_maps_get.html
   * or a GSM-derived index: evaluate pygsm at 408 MHz and 1420 MHz and
     take beta = ln(T1/T2)/ln(nu1/nu2).
   * or the Platania et al. 2003 index map.
   Missing variants are filled from the provided one(s): the reference's
   three variants (_md, _gsm, _gd) only feed alternative-model switching
   (reference galaxy.py:118-126), so a single real index map is already
   survey-constrained for all three.

3. Galactic Faraday rotation measure:
   * Hutschenreuter et al. 2022 "faraday_sky 2.0" (mean map):
     https://zenodo.org/record/6584970
   * or Oppermann et al. 2012: https://wwwmpa.mpa-garching.mpg.de/ift/faraday/

Usage:
  python tools/build_skydata_from_public.py \
      --haslam haslam408_dsds_Remazeilles2014.fits \
      --spectral-md fg_mdd_spectral_index.fits \
      --faraday faraday_sky_mean.fits \
      [--spectral-gsm ... --spectral-gd ...] \
      [--nside 512] [--out cora_tpu/data/skydata.npz]

Reads FITS with the pure-numpy reader (cora_tpu.healpix.fits) — no
healpy/astropy needed.  Validates the result through the package loader
and prints per-map statistics for sanity against the published values
(Haslam high-latitude ~ 10-40 K, plane 100s of K; beta ~ -3.1 to -2.5;
|RM| few rad/m^2 at the poles, ~100 in the plane).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cora_tpu.healpix import fits as hfits  # noqa: E402
from cora_tpu.healpix import pixel  # noqa: E402


def load_and_grade(path, nside, name):
    m = np.asarray(hfits.read_map(path, dtype=np.float64))
    m_nside = pixel.npix2nside(m.size)
    # pass bad-pixel sentinels through ud_grade as zeros, then restore
    bad = ~np.isfinite(m) | (m < -1e29)
    if bad.any():
        print(f"  {name}: {bad.sum()} UNSEEN/NaN pixels filled with the "
              "finite median")
        m = np.where(bad, np.median(m[~bad]), m)
    if m_nside != nside:
        m = np.asarray(pixel.ud_grade(m, nside))
        print(f"  {name}: ud_grade {m_nside} -> {nside}")
    print(f"  {name}: min={m.min():.3g} med={np.median(m):.3g} "
          f"max={m.max():.3g}")
    return m


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--haslam", required=True)
    ap.add_argument("--spectral-md")
    ap.add_argument("--spectral-gsm")
    ap.add_argument("--spectral-gd")
    ap.add_argument("--faraday", required=True)
    ap.add_argument("--nside", type=int, default=512)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cora_tpu", "data", "skydata.npz"),
    )
    args = ap.parse_args()

    spectral_paths = {
        "spectral_md": args.spectral_md,
        "spectral_gsm": args.spectral_gsm,
        "spectral_gd": args.spectral_gd,
    }
    provided = {k: v for k, v in spectral_paths.items() if v}
    if not provided:
        ap.error("provide at least one --spectral-* map (see module "
                 "docstring for public sources)")

    print("reading inputs:")
    out = {
        "haslam": load_and_grade(args.haslam, args.nside, "haslam"),
        "faraday": load_and_grade(args.faraday, args.nside, "faraday"),
    }
    spec = {k: load_and_grade(v, args.nside, k) for k, v in provided.items()}
    fallback = next(iter(spec.values()))
    for k in spectral_paths:
        out[k] = spec.get(k, fallback)
        if k not in spec:
            print(f"  {k}: filled from {next(iter(spec))}")

    # sanity: spectral indices should be negative (beta ~ -2.5..-3.2); some
    # products ship |beta| — flip if needed so downstream T ~ nu^beta dims
    for k in ("spectral_md", "spectral_gsm", "spectral_gd"):
        if np.median(out[k]) > 0:
            print(f"  {k}: median positive — negating (convention T∝ν^β)")
            out[k] = -out[k]

    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}")

    # validate through the package loader
    os.environ["CORA_TPU_SKYDATA"] = args.out
    from cora_tpu.foreground import skydata

    skydata._cache.clear()
    data = skydata.load_skydata()
    print("loader OK:", {k: v.shape for k, v in data.items()})


if __name__ == "__main__":
    main()
