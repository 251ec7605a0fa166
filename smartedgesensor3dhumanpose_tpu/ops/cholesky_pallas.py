"""Pallas TPU kernel: batched SPD Cholesky solve for the LM normal equations.

XLA's cholesky/triangular-solve custom calls cost ~140 us per LM iteration at
this size ([people, 63, 63] with a single RHS) — blocked algorithms tuned for
big matrices, dominated by fixed overheads here. This kernel factors and
solves entirely in VMEM with masked full-tile vector ops (the matrix stays
symmetric through the right-looking elimination, so both the pivot row and
column come from masked reductions — no transposes), one grid step per
person. Used for every damped LM step and for the marginal covariance
(inverse via N right-hand sides).

Falls back to interpreter mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_kernel(n: int, a_ref, b_ref, out_ref, fac_ref, rhs_ref):
    """One person's solve: A [N, N] SPD, B [N, R] -> X = A^{-1} B.

    fac_ref/rhs_ref: VMEM scratch copies factored/substituted in place.
    """
    nn = a_ref.shape[-2]
    rr = b_ref.shape[-1]
    row_a = jax.lax.broadcasted_iota(jnp.int32, (nn, a_ref.shape[-1]), 0)
    lane_a = jax.lax.broadcasted_iota(jnp.int32, (nn, a_ref.shape[-1]), 1)
    row_b = jax.lax.broadcasted_iota(jnp.int32, (nn, rr), 0)

    fac_ref[:] = a_ref[0]
    rhs_ref[:] = b_ref[0]

    # ---- right-looking Cholesky (lower factor stored at lane == k).
    def chol_step(k, _):
        a = fac_ref[:]
        colk = jnp.sum(
            jnp.where(lane_a == k, a, 0.0), axis=1, keepdims=True
        )  # A[:, k] ((N,1)); rows < k hold L columns but are masked below
        akk = jnp.sum(jnp.where((row_a == k) & (lane_a == k), a, 0.0))
        akk = jnp.maximum(akk, 1e-30)
        lkk = jnp.sqrt(akk)
        rowk = jnp.sum(
            jnp.where(row_a == k, a, 0.0), axis=0, keepdims=True
        )  # A[k, :] ((1,N)) — equals colk^T on the trailing block (symmetry)
        # Trailing update: rows > k, lanes > k.
        upd = a - colk * rowk / akk
        a = jnp.where((row_a > k) & (lane_a > k), upd, a)
        # Store L[:, k] (diagonal + below) at lane k.
        a = jnp.where((lane_a == k) & (row_a >= k), colk / lkk, a)
        fac_ref[:] = a
        return 0

    jax.lax.fori_loop(0, n, chol_step, 0)

    # ---- forward substitution: L Y = B (Y written into rhs_ref rows).
    def fwd_step(k, _):
        l = fac_ref[:]
        b = rhs_ref[:]
        lkk = jnp.sum(jnp.where((row_a == k) & (lane_a == k), l, 0.0))
        colk = jnp.sum(jnp.where((lane_a == k) & (row_a > k), l, 0.0),
                       axis=1, keepdims=True)  # strictly-below L[:, k]
        yk = jnp.sum(jnp.where(row_b == k, b, 0.0), axis=0, keepdims=True) / (
            jnp.maximum(lkk, 1e-30)
        )  # (1, R)
        b = jnp.where(row_b == k, yk, b)
        b = jnp.where(row_b > k, b - colk * yk, b)
        rhs_ref[:] = b
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0)

    # ---- backward substitution: L^T X = Y (X written into rhs_ref rows).
    def bwd_step(i, _):
        k = n - 1 - i
        l = fac_ref[:]
        y = rhs_ref[:]
        lkk = jnp.sum(jnp.where((row_a == k) & (lane_a == k), l, 0.0))
        colk = jnp.sum(jnp.where((lane_a == k) & (row_a > k), l, 0.0),
                       axis=1, keepdims=True)
        # sum_{i>k} L[i,k] * X[i,:]
        acc = jnp.sum(
            jnp.where(row_b > k, colk * y, 0.0), axis=0, keepdims=True
        )
        yk = jnp.sum(jnp.where(row_b == k, y, 0.0), axis=0, keepdims=True)
        xk = (yk - acc) / jnp.maximum(lkk, 1e-30)
        rhs_ref[:] = jnp.where(row_b == k, xk, y)
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0)
    out_ref[:] = rhs_ref[:][None]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _solve(a: jnp.ndarray, b: jnp.ndarray, n: int, interpret: bool):
    p, nn, _ = a.shape
    rr = b.shape[-1]
    kernel = functools.partial(_chol_solve_kernel, n)
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, nn, nn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nn, rr), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nn, rr), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, nn, rr), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nn, nn), jnp.float32),
            pltpu.VMEM((nn, rr), jnp.float32),
        ],
        interpret=interpret,
    )(a, b)


def cholesky_solve_pallas(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """Batched SPD solve X = A^{-1} B.

    Args:
      a: [P, N, N] SPD matrices (float32; N <= ~256).
      b: [P, N, R] right-hand sides.

    Returns:
      [P, N, R] solutions (float32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, n, _ = a.shape
    r = b.shape[-1]
    # Pad rows to a sublane multiple; padded diagonal gets 1s so the factor
    # stays well-defined (padded rows/cols are decoupled).
    n_pad = max(8, -(-n // 8) * 8)
    r_pad = max(8, -(-r // 8) * 8)
    a_p = jnp.zeros((p, n_pad, n_pad), jnp.float32)
    a_p = a_p.at[:, :n, :n].set(a.astype(jnp.float32))
    eye_tail = jnp.arange(n_pad) >= n
    a_p = a_p + jnp.where(eye_tail, 1.0, 0.0) * jnp.eye(n_pad, dtype=jnp.float32)
    b_p = jnp.zeros((p, n_pad, r_pad), jnp.float32)
    b_p = b_p.at[:, :n, :r].set(b.astype(jnp.float32))
    x = _solve(a_p, b_p, n_pad, bool(interpret))
    return x[:, :n, :r]
