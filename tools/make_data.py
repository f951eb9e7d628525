"""Convert upstream physics data tables into cora_tpu's npz data format.

The numbers in these tables are *physics data* (CAMB matter power spectra,
precomputed correlation-integral tables, radio source catalogues), carried
over from the reference package (radiocosmology/cora) so that this framework
reproduces the same physical models and passes the same golden-value
regression tests.  The code that *uses* them is all new.

Run from the repo root:  python tools/make_data.py <path-to-reference>
"""

import json
import os
import sys

import h5py
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "cora_tpu", "data")


def convert_ps_tables(ref):
    """Plain-text P(k) tables -> npz.

    ps_z1.5.dat: legacy (k, P) table at z=1.5 used by Corr21cm
    (reference corr21cm.py:24-29).
    """
    for name, z in [("ps_z1.5", 1.5), ("ps_z1.5_planck", 1.5)]:
        a = np.loadtxt(os.path.join(ref, "cora/signal/data", name + ".dat"))
        np.savez(
            os.path.join(OUT, name + ".npz"),
            k=a[:, 0],
            ps=a[:, 1],
            ps_redshift=z,
            provenance=f"converted from reference cora/signal/data/{name}.dat",
        )
        print(name, a.shape)


def convert_corr_table(ref):
    """Correlation-integral cache (r, xi_0, xi_2, xi_4) used by Corr21cm
    (reference corr.py:372-397, corr21cm.py:34)."""
    a = np.loadtxt(os.path.join(ref, "cora/signal/data/corr_z1.5.dat"))
    np.savez(
        os.path.join(OUT, "corr_z1.5.npz"),
        r=a[:, 0],
        vv0=a[:, 1],
        vv2=a[:, 2],
        vv4=a[:, 3],
        provenance="converted from reference cora/signal/data/corr_z1.5.dat",
    )
    print("corr_z1.5", a.shape)


def convert_camb_ps(ref):
    """CAMB Planck-2018 matter power spectra (linear + halofit variants)."""
    names = [
        "ps_planck2018_z1.0_linear",
        "ps_planck2018_z1.0_halofit-original",
        "ps_planck2018_z1.0_halofit-takahashi",
        "ps_planck2018_z1.0_halofit-mead",
        "ps_planck2018_z1.0_halofit-mead-feedback",
        "ps_cora-orig",
    ]
    for name in names:
        path = os.path.join(ref, "cora/signal/data", name + ".h5")
        with h5py.File(path, "r") as f:
            k = f["index_map/x_powerspectrum"][:]
            ps = f["powerspectrum"][:]
            attrs = {}
            for key, val in f.attrs.items():
                if isinstance(val, str) and val.startswith("!!_memh5_json:"):
                    attrs[key] = json.loads(val[len("!!_memh5_json:") :])
                else:
                    attrs[key] = val
        np.savez(
            os.path.join(OUT, name + ".npz"),
            k=k,
            ps=ps[0] if ps.ndim == 2 else ps,
            ps_redshift=float(attrs.get("ps_redshift", 0.0)),
            cosmology=json.dumps(attrs.get("cosmology", {})),
            camb_params=json.dumps(attrs.get("camb_params", {})),
            tag=str(attrs.get("tag", name)),
            provenance=f"converted from reference cora/signal/data/{name}.h5",
        )
        print(name, k.shape, ps.shape)


def convert_catalogue(ref):
    """Combined NVSS+VLSS point-source catalogue (reference
    cora/foreground/data/combinedps.dat, used by pointsource.py:397-523)."""
    with open(os.path.join(ref, "cora/foreground/data/combinedps.dat")) as f:
        a = np.genfromtxt(f, names=True)
    fields = {name: a[name] for name in a.dtype.names if name != "NAME"}
    np.savez(
        os.path.join(OUT, "combinedps.npz"),
        provenance="converted from reference cora/foreground/data/combinedps.dat",
        **fields,
    )
    print("combinedps", a.shape, a.dtype.names)


if __name__ == "__main__":
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    os.makedirs(OUT, exist_ok=True)
    convert_ps_tables(ref)
    convert_corr_table(ref)
    convert_camb_ps(ref)
    convert_catalogue(ref)
