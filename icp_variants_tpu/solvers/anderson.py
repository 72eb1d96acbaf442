"""Anderson-accelerated ICP (AA-ICP) — a beyond-reference extension.

ICP is a fixed-point iteration ``pose_{k+1} = G(pose_k)`` (one full
select/match/reject/solve step); Anderson acceleration (type II, window m)
extrapolates the next iterate from the last m residuals ``f_k = g_k - x_k``
in a minimal 6-dof pose chart, typically converging in noticeably fewer
iterations than plain ICP at ~zero extra cost per iteration (the mixing
solve is an (m, m) system). Reference: Pavlov et al., "AA-ICP: Iterative
Closest Point with Anderson Acceleration", arXiv:1709.05479 (retrieved in
PAPERS.md). No analog exists in /root/reference (its optimizer loop is the
plain fixed-point iteration, ICPOptimizer.h:236-318).

Safeguard: per the paper's fallback heuristic, when the residual norm
grows the history is discarded and the plain ICP step is taken — so a bad
extrapolation can never run away; the stationary points of the iteration
are unchanged (at a fixed point, f = 0 and AA returns g = x).

All shapes are static (ring buffers of size m+1), so the whole state rides
a ``lax.scan`` carry; the math is pure pose-space (replicated under
``shard_map``, batchable under ``vmap``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_variants_tpu.core import se3


def pose_to_vec(pose: jax.Array) -> jax.Array:
    """(4,4) pose -> 6-vector chart (axis-angle, translation).

    A valid bijective chart for |theta| < pi — scan-registration poses.
    """
    w = se3.matrix_to_axis_angle(pose[:3, :3])
    return jnp.concatenate([w, pose[:3, 3]])


def vec_to_pose(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pose_to_vec`."""
    return se3.pose_matrix(se3.axis_angle_to_matrix(x[:3]), x[3:])


class AAState(NamedTuple):
    """Ring buffers of the last ``m + 1`` (iterate, residual) pairs.

    ``count`` is the number of valid entries (from the newest backwards);
    ``prev_norm`` the previous residual norm for the restart safeguard.
    """

    xs: jax.Array         # (m + 1, 6)
    fs: jax.Array         # (m + 1, 6)
    count: jax.Array      # int32
    prev_norm: jax.Array  # float32


def init(m: int, dtype=jnp.float32) -> AAState:
    return AAState(
        xs=jnp.zeros((m + 1, 6), dtype),
        fs=jnp.zeros((m + 1, 6), dtype),
        count=jnp.asarray(0, jnp.int32),
        prev_norm=jnp.asarray(jnp.inf, jnp.float32),
    )


def step(
    state: AAState, x_k: jax.Array, g_k: jax.Array, m: int,
) -> tuple[AAState, jax.Array]:
    """One AA(m) mixing step: given the current iterate ``x_k`` and the
    plain fixed-point update ``g_k = G(x_k)``, return the accelerated next
    iterate. With no usable history (or after a safeguard restart) this is
    exactly the plain step ``g_k``."""
    f_k = g_k - x_k
    norm = jnp.sum(f_k * f_k)

    # Safeguard restart: residual grew => the previous extrapolation was
    # bad (or the fixed-point map changed, e.g. a multires level switch);
    # drop the history and fall back to the plain iteration.
    grew = norm > state.prev_norm
    count = jnp.where(grew, 0, state.count)

    xs = jnp.roll(state.xs, -1, axis=0).at[-1].set(x_k)
    fs = jnp.roll(state.fs, -1, axis=0).at[-1].set(f_k)
    count = jnp.minimum(count + 1, m + 1)

    # Differences over the ring tail: column j pairs entries j and j+1 of
    # the buffer; only the newest (count - 1) columns are valid. Invalid
    # columns are zeroed — with the ridge term their mixing weight solves
    # to exactly 0, i.e. they behave as absent.
    dF = (fs[1:] - fs[:-1]).T                        # (6, m)
    dG = ((xs[1:] + fs[1:]) - (xs[:-1] + fs[:-1])).T  # (6, m)
    col = jnp.arange(m)
    valid = col >= (m - (count - 1))
    dF = jnp.where(valid[None, :], dF, 0.0)
    dG = jnp.where(valid[None, :], dG, 0.0)

    A = dF.T @ dF
    ridge = 1e-10 * (jnp.trace(A) + 1.0)
    gamma = jnp.linalg.solve(
        A + ridge * jnp.eye(m, dtype=A.dtype), dF.T @ f_k
    )
    x_aa = g_k - dG @ gamma

    # count == 1 (fresh history) has no differences: take the plain step.
    x_next = jnp.where(count > 1, x_aa, g_k)
    return AAState(xs=xs, fs=fs, count=count, prev_norm=norm), x_next
