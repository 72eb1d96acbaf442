"""Gauss-Newton / Levenberg-Marquardt non-linear ICP inner solver.

This replaces the Ceres path of the reference (CeresICPOptimizer,
ICPOptimizer.h:181-483): per ICP iteration, with correspondences held fixed,
Ceres runs <= 10 LM steps (LEVENBERG_MARQUARDT, DENSE_QR,
ICPOptimizer.h:352-360) on autodiff residuals over a 6-dof axis-angle +
translation increment (constraints.h).

TPU-native design: the residual stack is a pure function of the 6-vector
increment; the Jacobian comes from ``jax.jacfwd`` (6 fused forward-mode
passes — the moral equivalent of Ceres' Jets); J^T J and J^T r reduce on the
MXU; the 6x6 damped system solves on-chip; and the whole LM loop is a
``lax.scan`` with accept/reject state — no host round-trips.

Residual blocks mirror prepareConstraints* exactly:
* POINT_TO_POINT: 3 rows/match, lambda=0.1           (constraints.h:29-31, 46)
* POINT_TO_PLANE: the SAME 3 point rows PLUS 1 plane row, lambda=1.0
                                                     (ICPOptimizer.h:412-431)
* SYMMETRIC:      point rows PLUS 1 symmetric row, lambda=1.0, where the
                  target is rotated by the inverse increment rotation
                                                     (constraints.h:95-143)
Every row is scaled by the match weight; invalid rows are masked to zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_variants_tpu.core import se3
from icp_variants_tpu.pipeline.config import Metric

LAMBDA_POINT = 0.1      # constraints.h:46
LAMBDA_PLANE = 1.0      # constraints.h:91
LAMBDA_SYMMETRIC = 1.0  # constraints.h:142


class _Residuals(NamedTuple):
    src: jax.Array          # (N, 3)
    tgt: jax.Array          # (N, 3)
    src_normals: jax.Array  # (N, 3) zeros where invalid
    tgt_normals: jax.Array  # (N, 3) zeros where invalid
    w_point: jax.Array      # (N,) weight incl. mask for point rows
    w_metric: jax.Array     # (N,) weight incl. mask + finite-normal mask
    gicp_l: jax.Array       # (N, 3, 3) GICP whiteners (zeros when unused;
                            # fixed per ICP iteration, standard GICP IRLS)


def _residual_fn(metric: Metric):
    def residuals(x: jax.Array, d: _Residuals) -> jax.Array:
        moved = se3.apply_increment(x, d.src)
        diff = moved - d.tgt
        if metric == Metric.GICP:
            # Pure Mahalanobis objective (no extra point rows — the
            # isotropic floor lives inside the whitener's epsilon).
            r = d.w_metric[:, None] * jnp.einsum("nji,nj->ni", d.gicp_l, diff)
            return r.reshape(-1)
        r_point = (LAMBDA_POINT * d.w_point)[:, None] * diff  # (N, 3)
        parts = [r_point.reshape(-1)]
        if metric == Metric.POINT_TO_PLANE:
            r_plane = LAMBDA_PLANE * d.w_metric * jnp.sum(d.tgt_normals * diff, axis=1)
            parts.append(r_plane)
        elif metric == Metric.SYMMETRIC:
            tgt_rot = se3.apply_increment_inv_rotation(x, d.tgt)
            n_sum = d.src_normals + d.tgt_normals
            r_sym = LAMBDA_SYMMETRIC * d.w_metric * jnp.sum(
                n_sum * (moved - tgt_rot), axis=1
            )
            parts.append(r_sym)
        return jnp.concatenate(parts)

    return residuals


class LMResult(NamedTuple):
    increment: jax.Array       # (6,) solved pose increment
    cost: jax.Array            # final 0.5*|r|^2
    initial_cost: jax.Array
    n_accepted: jax.Array


def solve_lm(
    metric: Metric,
    src: jax.Array,
    tgt: jax.Array,
    src_normals: jax.Array,
    tgt_normals: jax.Array,
    weights: jax.Array,
    valid: jax.Array,
    *,
    max_iterations: int = 10,
    function_tolerance: float = 1e-6,
    axis_name: str | None = None,
) -> LMResult:
    """Run <= ``max_iterations`` LM steps; returns the 6-vector increment.

    Damping follows Marquardt-Nielsen: solve
    ``(J^T J + mu * diag(J^T J)) dx = -J^T r``; on cost decrease accept and
    shrink mu, else reject and grow mu. Early termination (mirroring Ceres'
    ``function_tolerance``, the default 1e-6) freezes the state once the
    relative cost decrease falls below tolerance.
    """
    mask = valid.astype(src.dtype)
    finite_sn = jnp.isfinite(src_normals).all(axis=1)
    finite_tn = jnp.isfinite(tgt_normals).all(axis=1)
    if metric == Metric.SYMMETRIC:
        finite_metric = (finite_sn & finite_tn).astype(src.dtype)
    elif metric == Metric.GICP:
        # Non-finite normals already degrade to isotropic covariance
        # inside the whitener; no extra mask needed.
        finite_metric = jnp.ones_like(mask)
    else:
        finite_metric = finite_tn.astype(src.dtype)

    if metric == Metric.GICP:
        from icp_variants_tpu.solvers import linear as linear_solvers

        gicp_l = linear_solvers.gicp_whitener(src_normals, tgt_normals)
    else:
        gicp_l = jnp.zeros((src.shape[0], 3, 3), src.dtype)

    data = _Residuals(
        src=src,
        tgt=tgt,
        src_normals=jnp.where(finite_sn[:, None], src_normals, 0.0),
        tgt_normals=jnp.where(finite_tn[:, None], tgt_normals, 0.0),
        w_point=weights * mask,
        w_metric=weights * mask * finite_metric,
        gicp_l=gicp_l,
    )
    res_fn = _residual_fn(metric)

    def cost_of(x):
        r = res_fn(x, data)
        c = 0.5 * jnp.sum(r * r)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    x0 = jnp.zeros((6,), dtype=src.dtype)
    c0 = cost_of(x0)

    def step(state, _):
        x, mu, nu, cost, done, n_acc = state

        J = jax.jacfwd(res_fn)(x, data)        # (M, 6)
        r = res_fn(x, data)
        jtj = J.T @ J
        g = J.T @ r
        if axis_name is not None:
            jtj = jax.lax.psum(jtj, axis_name)
            g = jax.lax.psum(g, axis_name)
        diag = jnp.diag(jnp.clip(jnp.diag(jtj), 1e-12, None))
        dx = -jnp.linalg.solve(jtj + mu * diag, g)

        new_cost = cost_of(x + dx)
        pred_red = -(g @ dx + 0.5 * dx @ (jtj @ dx))
        rho = (cost - new_cost) / jnp.maximum(pred_red, 1e-30)

        accept = (new_cost < cost) & ~done
        x_next = jnp.where(accept, x + dx, x)
        factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        mu_next = jnp.where(accept, mu * factor, mu * nu)
        nu_next = jnp.where(accept, 2.0, nu * 2.0)
        cost_next = jnp.where(accept, new_cost, cost)

        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        done_next = done | (accept & (rel_decrease < function_tolerance))
        mu_next = jnp.where(done, mu, mu_next)
        nu_next = jnp.where(done, nu, nu_next)

        return (
            x_next,
            mu_next,
            nu_next,
            cost_next,
            done_next,
            n_acc + accept.astype(jnp.int32),
        ), None

    # Tie the constant carry components to the (device-varying) cost so the
    # scan carry has a uniform variance type under shard_map's VMA check.
    tie = c0 * 0.0
    init = (
        x0 + tie,
        jnp.asarray(1e-4, src.dtype) + tie,
        jnp.asarray(2.0, src.dtype) + tie,
        c0,
        c0 < 0.0,  # always False: "done" flag, varying like c0
        jnp.asarray(0, jnp.int32) + tie.astype(jnp.int32),
    )
    (x, _, _, cost, _, n_acc), _ = jax.lax.scan(step, init, None, length=max_iterations)
    return LMResult(increment=x, cost=cost, initial_cost=c0, n_accepted=n_acc)


def estimate_pose_lm(metric: Metric, *args, **kwargs) -> jax.Array:
    """Convenience wrapper returning the 4x4 incremental pose
    (PoseIncrement::convertToMatrix applied to the LM solution,
    ICPOptimizer.h:308-309)."""
    result = solve_lm(metric, *args, **kwargs)
    return se3.increment_to_matrix(result.increment)
