"""Spline tests mirroring the reference accuracy contract
(reference tests/test_cubicspline.py)."""

import numpy as np
import pytest
from pytest import approx

from cora_tpu.util import interpolation as cubicspline


def test_usage():
    x = np.arange(3)
    y = np.asarray([0, 10, 20], dtype=np.float64)
    with pytest.raises(cubicspline.InterpolationException):
        cubicspline.CubicSpline(x, y)

    x = np.arange(4)
    with pytest.raises(cubicspline.InterpolationException):
        cubicspline.CubicSpline(x, y)

    y = np.asarray([0.0, 10.0, 20.0, 30.0])
    y[1] = np.inf
    with pytest.raises(cubicspline.InterpolationException):
        cubicspline.CubicSpline(x, y)
    y[1] = np.nan
    with pytest.raises(cubicspline.InterpolationException):
        cubicspline.CubicSpline(x, y)


@pytest.mark.parametrize(
    "interpolater", [cubicspline.CubicSpline, cubicspline.LogSpline]
)
def test_constant(interpolater):
    x = np.arange(1, 8)
    y = np.ones(7)
    data = np.dstack((x, y))[0]
    p = interpolater(data)
    assert np.allclose(p(np.asarray([0.025, 1, 2.5, 4, 5.55, 7.01, 19.0])), 1.0)


def test_linear():
    x = np.arange(1, 5)
    y = np.asarray([10.0, 20, 30, 40])
    p = cubicspline.CubicSpline(np.dstack((x, y))[0])
    assert p(-1.0) == approx(-10)
    assert p(0.0) == approx(0)
    assert p(0.5) == approx(5)
    assert p(1.0) == approx(10)
    assert p(1.75) == approx(17.5)
    assert p(2.2) == approx(22)
    assert p(4.0) == approx(40)


def test_random_nodes():
    x = np.arange(1, 5).astype(np.float64)
    y = np.asarray([1.67, 1.99, 0.465, 0.234])
    p = cubicspline.CubicSpline(np.dstack((x, y))[0])
    for xi, yi in zip(x, y):
        assert p(xi) == approx(yi, rel=1e-13)


def test_polynomial():
    f = np.polynomial.polynomial.Polynomial((1, 2, 3))
    x = np.arange(0, 1000, 0.01)
    y = f(x)
    p = cubicspline.CubicSpline(x, y)
    xt = np.asarray([0, 1, 0.0998, 456, 666.666, 998.501, 999.98, 99.98999])
    assert np.abs(p(xt) - f(xt)).max() < 1e-7


def test_polynomial_edge():
    """Edge-region accuracy bound from the reference
    (tests/test_cubicspline.py:104-125)."""
    f = np.polynomial.polynomial.Polynomial((1, 2, 3))
    x = np.arange(0, 1000, 0.01)
    p = cubicspline.CubicSpline(x, f(x))
    error_bound = np.asarray([1.46e-05, 4.21e-06, 1.71e-06])
    for x_, err in zip(np.asarray([0.00101, 0.01111, 0.0001]), error_bound):
        assert abs(p(x_) - f(x_)) <= err


def test_vs_scipy_natural():
    """Our natural spline must agree with scipy's to float precision."""
    from scipy.interpolate import CubicSpline as SciSpline

    rng = np.random.RandomState(0)
    x = np.sort(rng.rand(30)) * 10
    y = np.sin(x) + 0.1 * rng.randn(30)
    p = cubicspline.CubicSpline(np.dstack((x, y))[0])
    s = SciSpline(x, y, bc_type="natural")
    xt = np.linspace(x[0], x[-1], 777)
    assert np.abs(np.asarray(p(xt)) - s(xt)).max() < 1e-12


def test_jit_and_vmap():
    """Spline evaluation must be jittable and vmappable."""
    import jax
    import jax.numpy as jnp

    x = np.linspace(0.0, 10.0, 50)
    y = np.cos(x)
    p = cubicspline.CubicSpline(np.dstack((x, y))[0])

    f = jax.jit(lambda xs: p.value(xs))
    xt = jnp.linspace(1.0, 9.0, 100)
    assert np.allclose(np.asarray(f(xt)), np.asarray(p(np.asarray(xt))))

    g = jax.vmap(lambda xs: p.value(xs))
    assert np.asarray(g(xt.reshape(10, 10))).shape == (10, 10)


def test_sinh_spline():
    x = np.linspace(-5, 5, 41)
    y = x**3
    p = cubicspline.SinhSpline(np.dstack((x, y))[0], x_t=0.1, f_t=0.1)
    xt = np.linspace(-4, 4, 101)
    assert np.abs(np.asarray(p(xt)) - xt**3).max() < 2e-2
