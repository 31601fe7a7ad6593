import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.ops.sh import sh_basis, sh_to_color


def reference_real_sh(direction):
    """Independent real-SH implementation from the standard closed forms.

    Band-major ordering with m = -l..l, matching the coefficient layout of
    3DGS (and the Sloan cascade in the code under test).
    """
    x, y, z = direction
    pi = np.pi
    out = [0.5 * np.sqrt(1 / pi)]
    # l=1: m=-1,0,1 -> (-y, z, -x) convention with sign from the Sloan method.
    c1 = np.sqrt(3 / (4 * pi))
    out += [-c1 * y, c1 * z, -c1 * x]
    # l=2
    out += [
        0.5 * np.sqrt(15 / pi) * x * y,
        -0.5 * np.sqrt(15 / pi) * y * z,
        0.25 * np.sqrt(5 / pi) * (3 * z * z - 1),
        -0.5 * np.sqrt(15 / pi) * x * z,
        0.25 * np.sqrt(15 / pi) * (x * x - y * y),
    ]
    # l=3
    out += [
        -0.25 * np.sqrt(35 / (2 * pi)) * y * (3 * x * x - y * y),
        0.5 * np.sqrt(105 / pi) * x * y * z,
        -0.25 * np.sqrt(21 / (2 * pi)) * y * (5 * z * z - 1),
        0.25 * np.sqrt(7 / pi) * z * (5 * z * z - 3),
        -0.25 * np.sqrt(21 / (2 * pi)) * x * (5 * z * z - 1),
        0.25 * np.sqrt(105 / pi) * (x * x - y * y) * z,
        -0.25 * np.sqrt(35 / (2 * pi)) * x * (x * x - 3 * y * y),
    ]
    # l=4
    out += [
        0.75 * np.sqrt(35 / pi) * x * y * (x * x - y * y),
        -0.75 * np.sqrt(35 / (2 * pi)) * y * z * (3 * x * x - y * y),
        0.75 * np.sqrt(5 / pi) * x * y * (7 * z * z - 1),
        -0.75 * np.sqrt(5 / (2 * pi)) * y * z * (7 * z * z - 3),
        (3.0 / 16.0) * np.sqrt(1 / pi) * (35 * z**4 - 30 * z * z + 3),
        -0.75 * np.sqrt(5 / (2 * pi)) * x * z * (7 * z * z - 3),
        (3.0 / 8.0) * np.sqrt(5 / pi) * (x * x - y * y) * (7 * z * z - 1),
        -0.75 * np.sqrt(35 / (2 * pi)) * x * z * (x * x - 3 * y * y),
        (3.0 / 16.0) * np.sqrt(35 / pi) * (x**4 - 6 * x * x * y * y + y**4),
    ]
    return np.array(out)


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_sh_basis_matches_closed_form(degree):
    rng = np.random.default_rng(degree)
    dirs = rng.normal(size=(16, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(sh_basis(degree, jnp.asarray(dirs, dtype=jnp.float32)))
    want = np.stack([reference_real_sh(d)[: (degree + 1) ** 2] for d in dirs])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sh_to_color_dc_only():
    coeffs = jnp.ones((4, 1, 3)) * 2.0
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    color = sh_to_color(0, dirs, coeffs)
    np.testing.assert_allclose(
        np.asarray(color), 2.0 * 0.2820947917738781 + 0.5, rtol=1e-6
    )


def test_sh_to_color_truncates_extra_bands():
    rng = np.random.default_rng(3)
    coeffs = jnp.asarray(rng.normal(size=(5, 9, 3)), dtype=jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    c1 = sh_to_color(1, dirs, coeffs)
    c1b = sh_to_color(1, dirs, coeffs[:, :4, :])
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c1b), rtol=1e-6)
