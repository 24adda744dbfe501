"""Golden tests for ops/linalg: the closed-form / unrolled batched
small-matrix routines must match the LAPACK-path results they replace."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movslam_tpu.ops.linalg import (
    chol_solve_small,
    det3x3,
    inv3x3,
    smallest_nullvec,
    solve_psd,
)

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _spd(rng, shape, n):
    A = rng.normal(0, 1, shape + (n, n)).astype(np.float32)
    return np.einsum("...ij,...kj->...ik", A, A) + n * np.eye(n, dtype=np.float32)


def test_det3x3_matches_numpy(rng):
    A = rng.normal(0, 1, (64, 3, 3)).astype(np.float32)
    got = np.asarray(det3x3(jnp.asarray(A)))
    want = np.linalg.det(A)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_inv3x3_matches_numpy(rng):
    S = _spd(rng, (128,), 3)
    got = np.asarray(inv3x3(jnp.asarray(S)))
    want = np.linalg.inv(S)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("n", [4, 6, 9, 12])
def test_chol_solve_small_matches_numpy(rng, n):
    S = _spd(rng, (32,), n)
    b = rng.normal(0, 1, (32, n)).astype(np.float32)
    got = np.asarray(chol_solve_small(jnp.asarray(S), jnp.asarray(b)))
    want = np.linalg.solve(S, b[..., None]).squeeze(-1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)


def test_solve_psd_matches_numpy(rng):
    S = _spd(rng, (), 96)
    b = rng.normal(0, 1, 96).astype(np.float32)
    got = np.asarray(solve_psd(jnp.asarray(S), jnp.asarray(b)))
    want = np.linalg.solve(S, b)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("n", [4, 9])
def test_smallest_nullvec_recovers_null_direction(rng, n):
    # Build Gram matrices with an exact 1-dim nullspace: n-1 random rows.
    B = rng.normal(0, 1, (64, n - 1, n)).astype(np.float32)
    AtA = np.einsum("bri,brj->bij", B, B)
    v = np.asarray(smallest_nullvec(jnp.asarray(AtA)))
    # v must be orthogonal to every row (A v = 0) and unit norm.
    res = np.abs(np.einsum("bri,bi->br", B, v)).max()
    assert res < 1e-3
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)


def test_smallest_nullvec_matches_eigh_on_noisy_gram(rng):
    # Noisy overdetermined homogeneous systems (the 8-point shape).
    A = rng.normal(0, 1, (32, 16, 9)).astype(np.float32)
    # Plant a near-null direction.
    null = rng.normal(0, 1, (32, 9)).astype(np.float32)
    null /= np.linalg.norm(null, axis=-1, keepdims=True)
    A -= np.einsum("bri,bi->br", A, null)[..., None] * null[:, None, :]
    A += 1e-3 * rng.normal(0, 1, A.shape).astype(np.float32)
    AtA = np.einsum("bri,brj->bij", A, A)
    v = np.asarray(smallest_nullvec(jnp.asarray(AtA)))
    w = np.linalg.eigh(AtA)[1][..., 0]
    # Same direction up to sign.
    dots = np.abs(np.sum(v * w, axis=-1))
    assert dots.min() > 0.999


def test_inv3x3_eps_guards_singular():
    S = jnp.zeros((4, 3, 3))
    out = np.asarray(inv3x3(S, eps=1e-30))
    assert np.all(np.isfinite(out))
