"""Cross-check the analytic point-to-plane Jacobian against jax.jacfwd
(SURVEY.md §4: 'GN step vs autodiff')."""
import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_tpu.utils import lie


def test_analytic_jacobian_matches_jacfwd():
    rng = np.random.default_rng(0)
    n = 64
    pts = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 5)
    normals = rng.standard_normal((n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = jnp.asarray(normals)
    q = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 5)
    T = jnp.asarray(np.asarray(lie.se3_exp(
        jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.3))))

    def residuals(delta):
        # right perturbation: T * (Exp(dw), dt) — the ICP retraction
        Td = T @ lie.se3_from_exp_rt(delta[:3], delta[3:])
        R, t = lie.se3_rt(Td)
        pw = pts @ R.T + t[None, :]
        return jnp.sum(normals * (pw - q), axis=-1)

    J_auto = np.asarray(jax.jacfwd(residuals)(jnp.zeros(6, jnp.float32)))

    # analytic: J = [n^T R, -n^T R [p]_x]  => [R^T n, p x (R^T n)]
    R = np.asarray(T)[:3, :3]
    a = np.asarray(normals) @ R
    J_analytic = np.concatenate([a, np.cross(np.asarray(pts), a)], axis=1)
    np.testing.assert_allclose(J_auto, J_analytic, atol=2e-4)
