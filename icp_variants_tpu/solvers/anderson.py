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

Safeguard (fallback in the spirit of the paper's heuristic, tuned on
this repo's workloads — scripts/aa_safeguard_probe.py): ICP's G is only
piecewise smooth (the match set changes discontinuously), so near
convergence raw AA amplifies match-set noise and oscillates. Two
mechanisms tame it without extra fixed-point evaluations:

1. growth restart — when the residual norm grows, the step just taken
   was a bad extrapolation (or G itself changed, e.g. a multires level
   switch): drop the history and take the plain step;
2. decaying trust clamp — every AA correction is capped at
   ``CLAMP * DECAY**restarts`` times the current residual norm, so each
   restart halves how far future extrapolations may leave the plain
   step; in the noisy terminal regime AA degenerates gracefully toward
   the plain iteration instead of bouncing around the noise floor.

Production-path sweep (scripts/aa_production_sweep.py; the jitted scan
and the eager probe diverge in the chaotic terminal regime, so constants
are picked on the real path): raw reset-only AA ends the tight-threshold
bunny 2.6x worse than plain; with CLAMP=5/DECAY=0.5 every window stays
within 8-11% of plain's terminal RMSE while the smooth synthetic pair
reaches plain's 14-iteration error at iteration 4 and ends ~5e5x lower.
m=2 is the recommended window (bunny x1.08, full acceleration).
Stationary points are unchanged (at a fixed point, f = 0 and AA
returns g = x).

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
    restarts: jax.Array   # int32, growth restarts so far (decays the clamp)


# Trust-region scale on AA corrections, halved on every growth restart
# (sweep: scripts/aa_safeguard_probe.py; 5.0 keeps the smooth-regime
# extrapolation intact — a rho~0.9 contraction needs ~1/(1-rho) ~ 10x f,
# reachable over two steps — while stopping noise-floor bounces).
CLAMP = 5.0
DECAY = 0.5


def init(m: int, dtype=jnp.float32) -> AAState:
    return AAState(
        xs=jnp.zeros((m + 1, 6), dtype),
        fs=jnp.zeros((m + 1, 6), dtype),
        count=jnp.asarray(0, jnp.int32),
        prev_norm=jnp.asarray(jnp.inf, jnp.float32),
        restarts=jnp.asarray(0, jnp.int32),
    )


def init_like(m: int, pose: jax.Array) -> AAState:
    """:func:`init` with every leaf derived from ``pose`` so the state
    carries the same varying-manual-axes as the scan body's output under
    ``shard_map`` (a constant-built carry would mismatch; see the
    match-cache note in parallel/sharded_icp.py)."""
    z = (jnp.sum(pose) * 0).astype(jnp.float32)
    return AAState(
        xs=jnp.zeros((m + 1, 6), jnp.float32) + z,
        fs=jnp.zeros((m + 1, 6), jnp.float32) + z,
        count=z.astype(jnp.int32),
        prev_norm=jnp.inf + z,
        restarts=z.astype(jnp.int32),
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
    # drop the history and fall back to the plain iteration, and halve
    # the trust clamp on all future extrapolations.
    grew = norm > state.prev_norm
    restarts = state.restarts + grew.astype(jnp.int32)
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

    # Decaying trust clamp: the AA correction may leave the plain step by
    # at most CLAMP * DECAY**restarts residual norms.
    delta = x_aa - g_k
    delta_norm = jnp.sqrt(jnp.sum(delta * delta)) + 1e-30
    trust = CLAMP * jnp.power(DECAY, restarts.astype(jnp.float32))
    scale = jnp.minimum(1.0, trust * jnp.sqrt(norm) / delta_norm)
    x_aa = g_k + scale * delta

    # count == 1 (fresh history, incl. right after a restart) has no
    # differences: take the plain step.
    x_next = jnp.where(count > 1, x_aa, g_k)
    return AAState(
        xs=xs, fs=fs, count=count, prev_norm=norm, restarts=restarts,
    ), x_next
