"""Distributed Schur-complement pose-graph solve over a device mesh.

The reference solves its pose graph with a single-host sparse LDLT
(reference PoseGraphOptimizer.cpp:340-348). A SLAM pose graph is a chain
of odometry factors plus a few loop-closure edges, so its Gauss-Newton
normal matrix is block-tridiagonal (6x6 blocks) plus a handful of
off-band entries. The distributed design (north star / SURVEY.md §2.4):

  * keyframes are partitioned into contiguous blocks, one per device,
    with partition boundaries placed AT loop-edge endpoints (host-side
    planning — loops are known before the solve), so every off-band edge
    couples only SEPARATOR variables;
  * each device eliminates its interior chain by block-tridiagonal
    forward elimination (a lax.scan), producing a 2x2-block Schur
    contribution onto its two separators;
  * contributions are all-gathered over ICI (tiny: (D+1) x 6 x 6 blocks),
    the reduced separator system (+ loop edges) is solved replicated,
    and interiors back-substitute locally in parallel.

This file provides both the single-device block-tridiagonal solver (the
exact baseline) and the shard_map-partitioned version, operating on the
same factor linearization as models/pose_graph.py.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["plan_partition", "dense_solve", "block_tridiag_solve",
           "schur_partitioned_solve"]


def plan_partition(n: int, n_blocks: int, loop_edges: Sequence[Tuple[int, int]]):
    """Choose separator indices: evenly spaced block boundaries, snapped to
    include every loop-edge endpoint. Returns sorted separator indices
    (always includes n-1). Host-side planning."""
    seps = set(int(round(i * (n - 1) / n_blocks)) for i in range(1, n_blocks + 1))
    for a, b in loop_edges:
        seps.add(int(a))
        seps.add(int(b))
    # Pose 0 stays interior of the first block (prior-pinned) UNLESS a loop
    # edge references it — schur_partitioned_solve requires every loop-edge
    # endpoint to be a separator, and loops back to keyframe 0 are the
    # common loop-back-to-start case (ADVICE round-1 item 1).
    if not any(0 in (int(a), int(b)) for a, b in loop_edges):
        seps.discard(0)
    return sorted(seps)


def dense_solve(diag, off, b, loop_edges=(), loop_blocks=()):
    """Reference dense solve of the block-tridiagonal(+loops) system, for
    testing. diag (n,6,6), off (n-1,6,6) with off[i] = H[i, i+1]."""
    n = diag.shape[0]
    H = np.zeros((n * 6, n * 6))
    for i in range(n):
        H[i*6:(i+1)*6, i*6:(i+1)*6] = diag[i]
    for i in range(n - 1):
        H[i*6:(i+1)*6, (i+1)*6:(i+2)*6] = off[i]
        H[(i+1)*6:(i+2)*6, i*6:(i+1)*6] = off[i].T
    for (a, bb), (Baa, Bab, Bbb) in zip(loop_edges, loop_blocks):
        H[a*6:(a+1)*6, a*6:(a+1)*6] += Baa
        H[a*6:(a+1)*6, bb*6:(bb+1)*6] += Bab
        H[bb*6:(bb+1)*6, a*6:(a+1)*6] += Bab.T
        H[bb*6:(bb+1)*6, bb*6:(bb+1)*6] += Bbb
    return np.linalg.solve(H, np.asarray(b).reshape(-1)).reshape(n, 6)


@jax.jit
def block_tridiag_solve(diag: jax.Array, off: jax.Array, b: jax.Array):
    """Single-device block-Thomas solve: diag (n,6,6), off (n-1,6,6)
    (off[i] = coupling of i to i+1), b (n,6). O(n) sequential scan —
    the on-device exact baseline for chain graphs."""
    n = diag.shape[0]
    off_p = jnp.concatenate([off, jnp.zeros((1, 6, 6), diag.dtype)])

    def fwd(carry, inp):
        C_prev, d_prev = carry          # C = D~^-1 U, d = D~^-1 b~
        D_i, U_i, b_i, L_i = inp        # L_i = off[i-1]^T = H[i, i-1]
        Dt = D_i - L_i @ C_prev
        bt = b_i - (L_i @ d_prev[:, None])[:, 0]
        C_i = jnp.linalg.solve(Dt, U_i)
        d_i = jnp.linalg.solve(Dt, bt[:, None])[:, 0]
        return (C_i, d_i), (C_i, d_i)

    L = jnp.concatenate([jnp.zeros((1, 6, 6), diag.dtype),
                         jnp.swapaxes(off, -1, -2)])
    init = (jnp.zeros((6, 6), diag.dtype), jnp.zeros((6,), diag.dtype))
    _, (C, d) = jax.lax.scan(fwd, init, (diag, off_p, b, L))

    def bwd(x_next, inp):
        C_i, d_i = inp
        x_i = d_i - (C_i @ x_next[:, None])[:, 0]
        return x_i, x_i

    _, xs = jax.lax.scan(bwd, jnp.zeros((6,), diag.dtype), (C, d), reverse=True)
    return xs


def _eliminate_interior(Dint, off_int, bint, Lsep, L_left, U_right, valid):
    """Eliminate one block's interior chain (m interior poses, FRONT-padded
    with identity/zero rows masked by `valid`) onto its (left, right)
    separators.

    Lsep (m,6,6): per-row coupling to the left separator — nonzero only at
    the first valid row, where it equals L_left = H[first_int, sep_l].
    U_right (6,6): coupling of the last interior pose to separator_right
    (H[last_int, sep_r]).

    Returns the Schur contribution (S_ll, S_lr, S_rl, S_rr, r_l, r_r) plus
    the factors needed for back-substitution.
    """
    m = Dint.shape[0]
    off_p = jnp.concatenate([off_int, jnp.zeros((1, 6, 6), Dint.dtype)])
    I = jnp.eye(6, dtype=Dint.dtype)

    # Forward elimination down the interior chain, carrying the mixing of
    # the left separator: x_i = d_i - C_i x_{i+1} - E_i x_l
    def fwd(carry, inp):
        C_prev, E_prev, d_prev = carry
        D_i, U_i, b_i, L_i, Lsep_i, v_i = inp
        Dt = jnp.where(v_i, D_i - L_i @ C_prev, I)
        rhs_b = jnp.where(v_i, b_i - (L_i @ d_prev[:, None])[:, 0], jnp.zeros(6, Dint.dtype))
        rhs_E = jnp.where(v_i, Lsep_i - L_i @ E_prev, jnp.zeros((6, 6), Dint.dtype))
        C_i = jnp.where(v_i, jnp.linalg.solve(Dt, U_i), jnp.zeros((6, 6), Dint.dtype))
        E_i = jnp.linalg.solve(Dt, rhs_E)
        d_i = jnp.linalg.solve(Dt, rhs_b[:, None])[:, 0]
        return (C_i, E_i, d_i), (C_i, E_i, d_i, Dt)

    L = jnp.concatenate([jnp.zeros((1, 6, 6), Dint.dtype),
                         jnp.swapaxes(off_int, -1, -2)])
    init = (jnp.zeros((6, 6), Dint.dtype), jnp.zeros((6, 6), Dint.dtype),
            jnp.zeros((6,), Dint.dtype))
    _, (C, E, d, Dt) = jax.lax.scan(
        fwd, init, (Dint, off_p, bint, L, Lsep, valid))

    # Last valid interior index couples to the right separator. The caller
    # pads so that the LAST row is always the last valid one when the block
    # is non-empty; emptiness handled by `any_valid`.
    any_valid = jnp.any(valid)
    C_last, E_last, d_last = C[-1], E[-1], d[-1]

    # Backward accumulation to express every x_i = g_i - F_i x_l - G_i x_r.
    def bwd(carry, inp):
        F_next, G_next, g_next = carry
        C_i, E_i, d_i, v_i = inp
        F_i = jnp.where(v_i, E_i - C_i @ F_next, jnp.zeros((6, 6), Dint.dtype))
        G_i = jnp.where(v_i, -C_i @ G_next, jnp.zeros((6, 6), Dint.dtype))
        g_i = jnp.where(v_i, d_i - (C_i @ g_next[:, None])[:, 0], jnp.zeros(6, Dint.dtype))
        return (F_i, G_i, g_i), (F_i, G_i, g_i)

    # seed: x_last = d_last - E_last x_l - (Dt_last^-1 U_right) x_r
    Ur_solved = jnp.linalg.solve(Dt[-1], U_right)
    init_b = (E_last, Ur_solved, d_last)
    (_, _, _), (F, G, g) = jax.lax.scan(
        bwd, init_b, (C[:-1], E[:-1], d[:-1], valid[:-1]), reverse=True)
    F = jnp.concatenate([F, E_last[None]])
    G = jnp.concatenate([G, Ur_solved[None]])
    g = jnp.concatenate([g, d_last[None]])

    # Schur contributions: eliminate interior from the separator equations.
    # Separator-left equation gains -L_left^T x_first; right gains
    # -U_right^T x_last. x_first lives at the FIRST VALID row (blocks are
    # front-padded), x_last at the last row.
    Lt = jnp.swapaxes(L_left, -1, -2)
    Ut = jnp.swapaxes(U_right, -1, -2)
    first = jnp.argmax(valid)  # index of first True (0 if none; masked below)
    F0, G0, g0 = F[first], G[first], g[first]
    Fm, Gm, gm = F[-1], G[-1], g[-1]
    z6 = jnp.zeros((6, 6), Dint.dtype)
    S_ll = jnp.where(any_valid, -Lt @ F0, z6)
    S_lr = jnp.where(any_valid, -Lt @ G0, z6)
    S_rl = jnp.where(any_valid, -Ut @ Fm, z6)
    S_rr = jnp.where(any_valid, -Ut @ Gm, z6)
    r_l = jnp.where(any_valid, -(Lt @ g0[:, None])[:, 0], jnp.zeros(6, Dint.dtype))
    r_r = jnp.where(any_valid, -(Ut @ gm[:, None])[:, 0], jnp.zeros(6, Dint.dtype))
    return (S_ll, S_lr, S_rl, S_rr, r_l, r_r), (F, G, g)


def schur_partitioned_solve(diag, off, b, separators: Sequence[int],
                            loop_edges=(), loop_blocks=(), mesh: Mesh = None,
                            mesh_axis: str = "data"):
    """Solve the chain(+separator loop edges) system by separator Schur
    complement. `separators` from plan_partition (each loop endpoint must
    be a separator). When `mesh` is given, interior eliminations and
    back-substitutions run sharded over `mesh_axis` via shard_map;
    otherwise they vmap on one device (same math).

    Returns x (n, 6) float64-or-input-dtype solution.
    """
    diag = jnp.asarray(diag)
    off = jnp.asarray(off)
    b = jnp.asarray(b)
    n = diag.shape[0]
    seps = list(separators)
    assert seps == sorted(seps) and seps[-1] == n - 1
    D = len(seps)  # number of interior blocks == number of separators

    # Interior ranges: block k covers (prev_sep, sep_k) exclusive of both
    # separators; block 0's "left separator" is virtual (no coupling).
    prev = [-1] + seps[:-1]
    max_m = max(max(s - p - 1 for p, s in zip(prev, seps)), 1)

    dtype = diag.dtype
    Dint = np.zeros((D, max_m, 6, 6), dtype)
    Oint = np.zeros((D, max_m - 1, 6, 6), dtype) if max_m > 1 else np.zeros((D, 0, 6, 6), dtype)
    Bint = np.zeros((D, max_m, 6), dtype)
    Lsep = np.zeros((D, max_m, 6, 6), dtype)
    Lleft = np.zeros((D, 6, 6), dtype)
    Uright = np.zeros((D, 6, 6), dtype)
    Valid = np.zeros((D, max_m), bool)

    diag_np = np.asarray(diag)
    off_np = np.asarray(off)
    b_np = np.asarray(b)
    for k, (p, s) in enumerate(zip(prev, seps)):
        m = s - p - 1
        if m == 0:
            continue
        sl = slice(p + 1, s)
        # Pad at the FRONT so the last row is the last interior pose.
        Dint[k, max_m - m:] = diag_np[sl]
        Dint[k, : max_m - m] = np.eye(6, dtype=dtype)
        if m > 1:
            Oint[k, max_m - m: max_m - 1] = off_np[p + 1: s - 1]
        Bint[k, max_m - m:] = b_np[sl]
        Valid[k, max_m - m:] = True
        if p >= 0:
            # H[p+1, p] couples first interior pose to left separator.
            Lleft[k] = off_np[p].T
            Lsep[k, max_m - m] = off_np[p].T
        Uright[k] = off_np[s - 1]

    elim = jax.vmap(_eliminate_interior)
    if mesh is not None:
        elim = jax.shard_map(
            jax.vmap(_eliminate_interior), mesh=mesh,
            in_specs=(P(mesh_axis),) * 7,
            out_specs=((P(mesh_axis),) * 6, (P(mesh_axis),) * 3),
            check_vma=False)
    (S_ll, S_lr, S_rl, S_rr, r_l, r_r), (F, G, g) = elim(
        jnp.asarray(Dint), jnp.asarray(Oint), jnp.asarray(Bint),
        jnp.asarray(Lsep), jnp.asarray(Lleft), jnp.asarray(Uright),
        jnp.asarray(Valid))

    # ---- reduced separator system (replicated; D x 6 dims) ----
    S_ll, S_lr, S_rl, S_rr = map(np.asarray, (S_ll, S_lr, S_rl, S_rr))
    r_l, r_r = np.asarray(r_l), np.asarray(r_r)
    Hs = np.zeros((D * 6, D * 6), dtype)
    bs = np.zeros(D * 6, dtype)
    sep_of = {s: i for i, s in enumerate(seps)}
    for i, s in enumerate(seps):
        Hs[i*6:(i+1)*6, i*6:(i+1)*6] += diag_np[s]
        bs[i*6:(i+1)*6] += b_np[s]
        # couplings between consecutive separators with empty interiors
        if i + 1 < D and seps[i + 1] == s + 1:
            Hs[i*6:(i+1)*6, (i+1)*6:(i+2)*6] += off_np[s]
            Hs[(i+1)*6:(i+2)*6, i*6:(i+1)*6] += off_np[s].T
    for k in range(D):
        i_r = k
        Hs[i_r*6:(i_r+1)*6, i_r*6:(i_r+1)*6] += S_rr[k]
        bs[i_r*6:(i_r+1)*6] += r_r[k]
        if k > 0:
            i_l = k - 1
            Hs[i_l*6:(i_l+1)*6, i_l*6:(i_l+1)*6] += S_ll[k]
            Hs[i_l*6:(i_l+1)*6, i_r*6:(i_r+1)*6] += S_lr[k]
            Hs[i_r*6:(i_r+1)*6, i_l*6:(i_l+1)*6] += S_rl[k]
            bs[i_l*6:(i_l+1)*6] += r_l[k]
    for (a, bb), (Baa, Bab, Bbb) in zip(loop_edges, loop_blocks):
        ia, ib = sep_of[a], sep_of[bb]
        Hs[ia*6:(ia+1)*6, ia*6:(ia+1)*6] += Baa
        Hs[ia*6:(ia+1)*6, ib*6:(ib+1)*6] += Bab
        Hs[ib*6:(ib+1)*6, ia*6:(ia+1)*6] += Bab.T
        Hs[ib*6:(ib+1)*6, ib*6:(ib+1)*6] += Bbb
    xs = np.linalg.solve(Hs, bs).reshape(D, 6)

    # ---- back-substitution: x_i = g_i - F_i x_left - G_i x_right ----
    F, G, g = np.asarray(F), np.asarray(G), np.asarray(g)
    x = np.zeros((n, 6), dtype)
    for i, s in enumerate(seps):
        x[s] = xs[i]
    for k, (p, s) in enumerate(zip(prev, seps)):
        m = s - p - 1
        if m == 0:
            continue
        xl = xs[sep_of[p]] if p in sep_of else np.zeros(6, dtype)
        xr = xs[sep_of[s]]
        xi = g[k] - F[k] @ xl - G[k] @ xr
        x[p + 1: s] = xi[max_m - m:]
    return x
