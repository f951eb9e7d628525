"""HEALPix pixelisation tests: roundtrips, orderings, interpolation."""

import numpy as np
import pytest

from cora_tpu.healpix import pixel as hp


@pytest.mark.parametrize("nside", [1, 2, 4, 8, 16, 64])
def test_pix2ang_roundtrip(nside):
    npix = hp.nside2npix(nside)
    ipix = np.arange(npix)
    th, ph = hp.pix2ang(nside, ipix)
    assert np.array_equal(hp.ang2pix(nside, th, ph), ipix)


@pytest.mark.parametrize("nside", [1, 2, 4, 8, 64])
def test_nest_ring_bijection(nside):
    npix = hp.nside2npix(nside)
    ipix = np.arange(npix)
    n = hp.ring2nest(nside, ipix)
    assert len(np.unique(n)) == npix
    assert np.array_equal(hp.nest2ring(nside, n), ipix)


def test_nest_hierarchy():
    """Children of a NEST pixel must lie geometrically inside the parent."""
    nside, fac = 8, 2
    for parent in [0, 100, 500, hp.nside2npix(nside) - 1]:
        children = 4 * parent + np.arange(4)
        pc = hp.nest2ring(nside * fac, children)
        thc, phc = hp.pix2ang(nside * fac, pc)
        vp = hp.ang2vec(*hp.pix2ang(nside, hp.nest2ring(nside, np.array([parent]))))
        vc = hp.ang2vec(thc, phc)
        d = np.arccos(np.clip(vc @ vp[0], -1, 1))
        assert (d < 2 * hp.nside2resol(nside)).all()


def test_ring_info():
    for nside in [1, 2, 8, 32]:
        info = hp.ring_info(nside)
        assert info["nphi"].sum() == hp.nside2npix(nside)
        th0, ph0 = hp.pix2ang(nside, info["start"])
        assert np.allclose(th0, info["theta"])
        assert np.allclose(ph0, info["phi0"])
        # rings strictly ordered north to south
        assert (np.diff(info["cth"]) < 0).all()


def test_ang2pix_nearest():
    """ang2pix must return (one of) the nearest pixel centres."""
    nside = 16
    rng = np.random.RandomState(1)
    th = np.arccos(rng.uniform(-1, 1, 500))
    ph = rng.uniform(0, 2 * np.pi, 500)
    p = hp.ang2pix(nside, th, ph)
    thc, phc = hp.pix2ang(nside, p)
    cosd = np.cos(th) * np.cos(thc) + np.sin(th) * np.sin(thc) * np.cos(ph - phc)
    d = np.arccos(np.clip(cosd, -1, 1))
    assert d.max() < 1.2 * hp.nside2resol(nside)


def test_ud_grade():
    rng = np.random.RandomState(2)
    m = rng.randn(hp.nside2npix(8))
    down = hp.ud_grade(m, 4)
    assert down.shape[-1] == hp.nside2npix(4)
    assert np.isclose(down.mean(), m.mean())
    up = hp.ud_grade(m, 16)
    assert np.isclose(up.mean(), m.mean())
    assert np.allclose(hp.ud_grade(up, 8), m)


def test_interp_val():
    nside = 32
    th, ph = hp.pix2ang(nside, np.arange(hp.nside2npix(nside)))
    smooth = np.cos(th) + 0.3 * np.sin(th) * np.cos(ph)
    # exact at pixel centres
    assert np.abs(hp.get_interp_val(smooth, th, ph) - smooth).max() < 1e-12
    # small error elsewhere
    rng = np.random.RandomState(3)
    th_r = np.arccos(rng.uniform(-1, 1, 2000))
    ph_r = rng.uniform(0, 2 * np.pi, 2000)
    truth = np.cos(th_r) + 0.3 * np.sin(th_r) * np.cos(ph_r)
    err = np.abs(hp.get_interp_val(smooth, th_r, ph_r) - truth)
    assert err.max() < 0.01


def test_neighbours_cover_adjacency():
    """Neighbour sets must contain all geometrically adjacent pixels."""
    nside = 8
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    v = hp.ang2vec(th, ph)
    res = hp.nside2resol(nside)
    rng = np.random.RandomState(4)
    for p in rng.choice(npix, 100, replace=False):
        d = np.arccos(np.clip(v @ v[p], -1, 1))
        adjacent = set(np.where((d > 0.2 * res) & (d < 1.2 * res))[0].tolist())
        mine = set(int(x) for x in hp.get_all_neighbours(nside, p).ravel() if x >= 0)
        assert adjacent.issubset(mine)


def test_rotator_roundtrip():
    """Rotator G→C→G angle roundtrip and map-path consistency."""
    from cora_tpu.healpix.transforms import Rotator, coord_x2y
    from cora_tpu.healpix import pixel

    r = Rotator(coord=["G", "C"])
    ri = Rotator(coord=["C", "G"])
    th = np.array([0.3, 1.0, 2.5])
    ph = np.array([0.1, 2.0, 5.0])
    th2, ph2 = ri(*r(th, ph))
    assert np.allclose(th2, th, atol=1e-9)
    assert np.allclose(np.mod(ph2 - ph, 2 * np.pi), 0.0, atol=1e-8) or \
        np.allclose(np.abs(np.mod(ph2 - ph + np.pi, 2*np.pi) - np.pi), 0.0, atol=1e-8)

    nside = 8
    m = np.cos(np.asarray(pixel.pix2ang(nside, np.arange(12 * nside**2))[0]))
    assert np.allclose(r.rotate_map_pixel(m), coord_x2y(m, "G", "C"))


def test_fits_map_roundtrip(tmp_path):
    """Pure-numpy FITS map I/O (healpy read_map/write_map subset)."""
    from cora_tpu.healpix import fits as hfits
    from cora_tpu.healpix import pixel

    nside = 16
    rng = np.random.RandomState(3)
    m = rng.randn(12 * nside * nside)

    p = str(tmp_path / "ring.fits")
    hfits.write_map(p, m)
    back = hfits.read_map(p)
    assert np.abs(back - m.astype(np.float32)).max() == 0.0

    hdr = hfits.read_map_header(p)
    assert hdr["NSIDE"] == nside and hdr["ORDERING"] == "RING"

    # NESTED on disk, RING on read
    pn = str(tmp_path / "nest.fits")
    hfits.write_map(pn, np.asarray(pixel.reorder(m, r2n=True)), nest=True)
    back_n = hfits.read_map(pn)
    assert np.abs(back_n - m.astype(np.float32)).max() == 0.0

    # f64 storage
    pd = str(tmp_path / "d.fits")
    hfits.write_map(pd, m, dtype=np.float64)
    assert np.abs(hfits.read_map(pd) - m).max() == 0.0
