"""Regenerate the matter power-spectrum tables in cora_tpu/data.

Counterpart of the reference's data regeneration script
(cora/signal/data/generate_powerspectra.py:1-72): runs CAMB for the
package cosmology at z=1 and writes linear + halofit variants in the
simple container schema read by
``cora_tpu.signal.lsscontainers.MatterPowerSpectrum``.

CAMB is not bundled with this image — the script degrades to a clear
message; the shipped ``cora_tpu/data/*.npz`` tables were converted from
the reference's committed CAMB outputs (tools/make_data.py).
"""

import json
import os
import sys

import numpy as np

OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "cora_tpu", "data"
)

VARIANTS = {
    "linear": dict(nonlinear=False, halofit=None),
    "halofit_original": dict(nonlinear=True, halofit="original"),
    "halofit_mead2020": dict(nonlinear=True, halofit="mead2020"),
    "halofit_takahashi": dict(nonlinear=True, halofit="takahashi"),
    "halofit_casarini": dict(nonlinear=True, halofit="casarini"),
}


def main():
    try:
        import camb
    except ImportError:
        sys.exit(
            "CAMB is not installed in this environment. The shipped "
            "cora_tpu/data/*.npz tables were converted from the reference "
            "checkout (tools/make_data.py); install camb to regenerate "
            "them from scratch."
        )

    from cora_tpu.cosmology import Cosmology

    c = Cosmology()
    z = 1.0
    for name, cfg in VARIANTS.items():
        pars = camb.CAMBparams()
        pars.set_cosmology(
            H0=100.0 * c.H0 if c.H0 < 10 else c.H0,
            ombh2=c.omega_b * (c.H0 / 100.0) ** 2,
            omch2=c.omega_c * (c.H0 / 100.0) ** 2,
        )
        pars.InitPower.set_params(ns=getattr(c, "n_s", 0.9652))
        pars.set_matter_power(redshifts=[z], kmax=100.0)
        if cfg["nonlinear"]:
            pars.NonLinear = camb.model.NonLinear_both
            if cfg["halofit"]:
                pars.NonLinearModel.set_params(halofit_version=cfg["halofit"])
        results = camb.get_results(pars)
        kh, _, pk = results.get_matter_power_spectrum(
            minkh=1e-4, maxkh=100.0, npoints=1024
        )
        np.savez(
            os.path.join(OUT_DIR, f"ps_{name}_z1.npz"),
            k=kh,
            ps=pk[0],
            redshift=z,
            cosmology=json.dumps(c.to_dict()),
        )
        print(f"wrote ps_{name}_z1.npz")


if __name__ == "__main__":
    main()
