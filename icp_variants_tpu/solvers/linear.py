"""Linear (small-angle) point-to-plane and symmetric-ICP solvers.

TPU-native re-design of ``LinearICPOptimizer``'s closed-form paths
(ICPOptimizer.h:676-898). The reference materializes a dense ``4N x 6``
system and runs JacobiSVD / FullPivLU on the host; here the 6x6 normal
equations ``A^T A`` / ``A^T b`` are accumulated directly from per-point row
blocks — one masked einsum that XLA fuses into an MXU reduction — and the
tiny 6x6 solve happens on-chip.

Numerics: the reference solves in-place at world scale; on TPU (f32) the
point-to-plane system is preconditioned by centering both clouds at the
matched-target mean, which is an exact reparametrization (the recovered pose
is conjugated back by the centroid translation) and keeps A^T A
well-conditioned at ETH scale. The symmetric path centers by construction,
exactly like the reference (ICPOptimizer.h:795-807).

Row layouts per match (weights fold in mask * per-match weight):
* plane row  (lambda=1.0):  [n x s ; n] . x = n.(d - s)        (ICPOptimizer.h:698-710)
* point rows (lambda=0.1):  small-angle  Ms + t - d            (ICPOptimizer.h:717-733)
* symmetric row (lambda=1.0): [(s~+d~) x (ns+nt) ; ns+nt] . x = (d~-s~).(ns+nt)
                                                               (ICPOptimizer.h:809-815)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icp_variants_tpu.core import se3

LAMBDA_POINT = 0.1       # ICPOptimizer.h:737
LAMBDA_PLANE = 1.0       # ICPOptimizer.h:738
LAMBDA_SYMMETRIC = 1.0   # ICPOptimizer.h:840
TIKHONOV_SYMMETRIC = 1e-4  # ICPOptimizer.h:863
GICP_EPSILON = 1e-3      # Segal et al., plane-disk covariance floor


def _point_rows(s: jax.Array) -> jax.Array:
    """The three small-angle point-to-point rows per match, (N, 3, 6).

    Row k solves coordinate k of ``Ms + t = d`` with
    M = [[1, -g, b], [g, 1, -a], [-b, a, 1]] (ICPOptimizer.h:717-733).
    """
    n = s.shape[0]
    zeros = jnp.zeros((n,), dtype=s.dtype)
    ones = jnp.ones((n,), dtype=s.dtype)
    r0 = jnp.stack([zeros, s[:, 2], -s[:, 1], ones, zeros, zeros], axis=1)
    r1 = jnp.stack([-s[:, 2], zeros, s[:, 0], zeros, ones, zeros], axis=1)
    r2 = jnp.stack([s[:, 1], -s[:, 0], zeros, zeros, zeros, ones], axis=1)
    return jnp.stack([r0, r1, r2], axis=1)


def _accumulate_normal_equations(
    rows: jax.Array,  # (N, R, 6)
    rhs: jax.Array,   # (N, R)
    row_w: jax.Array, # (N, R) mask-and-lambda weights (rows scaled => residual weighted by w^2)
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    wr = rows * row_w[..., None]
    wb = rhs * row_w
    ata = jnp.einsum("nri,nrj->ij", wr, wr)
    atb = jnp.einsum("nri,nr->i", wr, wb)
    if axis_name is not None:
        ata = jax.lax.psum(ata, axis_name)
        atb = jax.lax.psum(atb, axis_name)
    return ata, atb


def _point_row_specs(s: jax.Array, d: jax.Array, w):
    """The three small-angle point rows of :func:`_point_rows` as sparse
    column SPECS for :func:`_accumulate_normal_equations_soa` — each row
    has exactly three nonzero columns (two cross-term coordinates and a
    constant 1), so the structure-aware accumulation touches 9 products
    per row instead of 36."""
    return [
        ([None, s[:, 2], -s[:, 1], 1.0, None, None], d[:, 0] - s[:, 0], w),
        ([-s[:, 2], None, s[:, 0], None, 1.0, None], d[:, 1] - s[:, 1], w),
        ([s[:, 1], -s[:, 0], None, None, None, 1.0], d[:, 2] - s[:, 2], w),
    ]


def _accumulate_normal_equations_soa(
    row_specs, axis_name: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Normal-equation accumulation without (N, R, 6) intermediates.

    ``row_specs`` is a list of ``(cols, rhs, w)`` per residual row type:
    ``cols`` gives the 6 Jacobian columns as (N,) arrays, Python floats
    (constants) or None (structural zeros); ``rhs``/``w`` are (N,). The
    math is identical to :func:`_accumulate_normal_equations` (ata[i,j] =
    sum_r sum_n w_r^2 a_i a_j) up to f32 reassociation, but each entry is
    ONE fused multiply-reduce over (N,) vectors. The einsum formulation
    materializes its (N, R, 6) operands, and TPU pads trailing (R, 6)
    dims to full (8, 128) tiles — a 21x HBM inflation that cost ~7
    ms/frame-iter at the dense color tracker's 307k matches (stop-after
    profile, scripts/evidence/color_decomp_log.txt). ETH-scale sparse
    selections never noticed (N ~ 4k). Sharded callers psum the final
    6x6/6 like before.
    """
    ata = [[0.0] * 6 for _ in range(6)]
    atb = [0.0] * 6
    for cols, rhs, w in row_specs:
        w2 = w * w
        for i in range(6):
            ci = cols[i]
            if ci is None:
                continue
            atb[i] = atb[i] + jnp.sum(w2 * ci * rhs)
            for j in range(i, 6):
                cj = cols[j]
                if cj is None:
                    continue
                ata[i][j] = ata[i][j] + jnp.sum(w2 * ci * cj)
    for i in range(6):
        for j in range(i):
            ata[i][j] = ata[j][i]
    ata_m = jnp.stack([jnp.stack([jnp.asarray(v, jnp.float32)
                                  for v in row]) for row in ata])
    atb_v = jnp.stack([jnp.asarray(v, jnp.float32) for v in atb])
    if axis_name is not None:
        ata_m = jax.lax.psum(ata_m, axis_name)
        atb_v = jax.lax.psum(atb_v, axis_name)
    return ata_m, atb_v


def estimate_pose_point_to_plane(
    src: jax.Array,          # (N, 3) matched transformed source points
    tgt: jax.Array,          # (N, 3) matched target points
    tgt_normals: jax.Array,  # (N, 3)
    weights: jax.Array,      # (N,)
    valid: jax.Array,        # (N,) bool
    axis_name: str | None = None,
) -> jax.Array:
    """Linearized point-to-plane solve; returns the 4x4 incremental pose.

    Pose recovery from Euler angles R = Rx(a) Ry(b) Rz(g) matches
    ICPOptimizer.h:768-779.
    """
    m = valid.astype(src.dtype)
    w = weights * m

    # Precondition: rotate-about-centroid parametrization (see module doc).
    center = se3.masked_mean(tgt, valid, axis_name=axis_name)
    s = src - center
    d = tgt - center
    n = jnp.where(jnp.isfinite(tgt_normals), tgt_normals, 0.0)
    finite_n = jnp.isfinite(tgt_normals).all(axis=1).astype(src.dtype)

    # Plane row: [cross(s, n), n] (ICPOptimizer.h:698-703), as sparse
    # column specs — no (N, 4, 6) row tensor is ever materialized (see
    # _accumulate_normal_equations_soa for the dense-shape rationale).
    plane_cols = [
        n[:, 2] * s[:, 1] - n[:, 1] * s[:, 2],
        n[:, 0] * s[:, 2] - n[:, 2] * s[:, 0],
        n[:, 1] * s[:, 0] - n[:, 0] * s[:, 1],
        n[:, 0], n[:, 1], n[:, 2],
    ]
    plane_rhs = jnp.sum(n * d, axis=1) - jnp.sum(n * s, axis=1)

    specs = [(plane_cols, plane_rhs, LAMBDA_PLANE * w * finite_n)]
    specs += _point_row_specs(s, d, LAMBDA_POINT * w)
    ata, atb = _accumulate_normal_equations_soa(specs, axis_name)
    x = jnp.linalg.solve(ata + 1e-12 * jnp.eye(6, dtype=ata.dtype), atb)

    R = se3.euler_xyz_to_matrix(x[0], x[1], x[2])
    pose_centered = se3.pose_matrix(R, x[3:6])
    # Undo the centering reparametrization: T = Trans(c) T' Trans(-c).
    return (
        se3.translation_matrix(center)
        @ pose_centered
        @ se3.translation_matrix(-center)
    )


def estimate_pose_symmetric(
    src: jax.Array,          # (N, 3) matched transformed source points
    tgt: jax.Array,          # (N, 3) matched target points
    src_normals: jax.Array,  # (N, 3) transformed source normals
    tgt_normals: jax.Array,  # (N, 3)
    weights: jax.Array,      # (N,)
    valid: jax.Array,        # (N,) bool
    axis_name: str | None = None,
) -> jax.Array:
    """Symmetric ICP (Rusinkiewicz 2019) linear solve, ICPOptimizer.h:784-898.

    Centers both clouds at their matched means, solves the normal equations
    with Tikhonov 1e-4, recovers rotation from the a*tan(theta)
    parametrization and composes
    ``T(mu_t) . R . T(t) . R . T(-mu_s)`` exactly like the reference.
    """
    m = valid.astype(src.dtype)
    w = weights * m

    mean_src = se3.masked_mean(src, valid, axis_name=axis_name)
    mean_tgt = se3.masked_mean(tgt, valid, axis_name=axis_name)
    s = src - mean_src
    d = tgt - mean_tgt

    ns = jnp.where(jnp.isfinite(src_normals), src_normals, 0.0)
    nt = jnp.where(jnp.isfinite(tgt_normals), tgt_normals, 0.0)
    finite_n = (
        jnp.isfinite(src_normals).all(axis=1) & jnp.isfinite(tgt_normals).all(axis=1)
    ).astype(src.dtype)
    n_sum = ns + nt

    # Symmetric row: [cross(s + d, n_sum), n_sum] as sparse column specs
    # (no (N, 4, 6) materialization; see _accumulate_normal_equations_soa).
    sd = s + d
    sym_cols = [
        sd[:, 1] * n_sum[:, 2] - sd[:, 2] * n_sum[:, 1],
        sd[:, 2] * n_sum[:, 0] - sd[:, 0] * n_sum[:, 2],
        sd[:, 0] * n_sum[:, 1] - sd[:, 1] * n_sum[:, 0],
        n_sum[:, 0], n_sum[:, 1], n_sum[:, 2],
    ]
    sym_rhs = jnp.sum((d - s) * n_sum, axis=1)

    specs = [(sym_cols, sym_rhs, LAMBDA_SYMMETRIC * w * finite_n)]
    specs += _point_row_specs(s, d, LAMBDA_POINT * w)
    ata, atb = _accumulate_normal_equations_soa(specs, axis_name)
    ata = ata + (TIKHONOV_SYMMETRIC**2) * jnp.eye(6, dtype=ata.dtype)
    x = jnp.linalg.solve(ata, atb)

    a_tilde = x[:3]
    t_tilde = x[3:6]
    tan_theta = jnp.linalg.norm(a_tilde)
    safe_tan = jnp.where(tan_theta > 1e-12, tan_theta, 1.0)
    axis = a_tilde / safe_tan
    sin_theta = tan_theta / jnp.sqrt(1.0 + tan_theta * tan_theta)
    cos_theta = jnp.where(tan_theta > 1e-12, sin_theta / safe_tan, 1.0)
    t = t_tilde * cos_theta

    R = jnp.where(
        tan_theta > 1e-12,
        se3.rodrigues_matrix(axis, sin_theta, cos_theta),
        jnp.eye(3, dtype=x.dtype),
    )
    rod = se3.pose_matrix(R, jnp.zeros(3, dtype=x.dtype))

    return (
        se3.translation_matrix(mean_tgt)
        @ rod
        @ se3.translation_matrix(t)
        @ rod
        @ se3.translation_matrix(-mean_src)
    )


def gicp_whitener(
    src_normals: jax.Array,  # (N, 3) transformed source normals
    tgt_normals: jax.Array,  # (N, 3)
    eps: float = GICP_EPSILON,
) -> jax.Array:
    """Per-match GICP whitening matrices L, (N, 3, 3) lower-triangular.

    Generalized-ICP (Segal et al., RSS 2009 — extension, no reference
    analog) models each point as a plane-aligned Gaussian with covariance
    ``C = I - (1 - eps) n n^T`` (unit variance in-plane, ``eps`` along the
    normal) and minimizes the Mahalanobis distance under the combined
    covariance ``C_t + R C_s R^T``. The source normals passed here are the
    ALREADY-TRANSFORMED ones, so ``C_s' = R C_s R^T`` directly. L is the
    Cholesky factor of ``M = (C_t + C_s')^{-1}``; whitened residuals
    ``L^T d`` turn the Mahalanobis objective into plain least squares on
    the MXU. Non-finite normals zero out => isotropic covariance
    (graceful point-to-point fallback for that match). All 3x3 algebra is
    batched (no data-dependent control flow)."""
    ns = jnp.where(jnp.isfinite(src_normals), src_normals, 0.0)
    nt = jnp.where(jnp.isfinite(tgt_normals), tgt_normals, 0.0)
    eye = jnp.eye(3, dtype=src_normals.dtype)
    c = (
        2.0 * eye
        - (1.0 - eps) * jnp.einsum("ni,nj->nij", ns, ns)
        - (1.0 - eps) * jnp.einsum("ni,nj->nij", nt, nt)
    )  # symmetric PD: eigenvalues in [2*eps, 2]
    m = jnp.linalg.inv(c)
    # Symmetrize against f32 inv roundoff before the Cholesky.
    m = 0.5 * (m + jnp.swapaxes(m, -1, -2))
    return jnp.linalg.cholesky(m)


def estimate_pose_gicp(
    src: jax.Array,          # (N, 3) matched transformed source points
    tgt: jax.Array,          # (N, 3) matched target points
    src_normals: jax.Array,  # (N, 3) transformed source normals
    tgt_normals: jax.Array,  # (N, 3)
    weights: jax.Array,      # (N,)
    valid: jax.Array,        # (N,) bool
    axis_name: str | None = None,
) -> jax.Array:
    """Linearized Generalized-ICP solve; returns the 4x4 incremental pose.

    One Gauss-Newton step on the whitened small-angle system: per match the
    three point rows of ``Ms + t = d`` (the same small-angle blocks the
    reference point metric uses) are premultiplied by ``L^T`` so their
    normal equations accumulate the Mahalanobis objective. Centered at the
    matched-target mean like the point-to-plane path (exact
    reparametrization, f32 conditioning); Euler-angle pose recovery
    identical."""
    m = valid.astype(src.dtype)
    w = weights * m

    center = se3.masked_mean(tgt, valid, axis_name=axis_name)
    s = src - center
    d = tgt - center

    L = gicp_whitener(src_normals, tgt_normals)
    rows = jnp.einsum("nji,njk->nik", L, _point_rows(s))   # (N, 3, 6)
    rhs = jnp.einsum("nji,nj->ni", L, d - s)               # (N, 3)
    row_w = jnp.stack([w, w, w], axis=1)

    ata, atb = _accumulate_normal_equations(rows, rhs, row_w, axis_name)
    x = jnp.linalg.solve(ata + 1e-12 * jnp.eye(6, dtype=ata.dtype), atb)

    R = se3.euler_xyz_to_matrix(x[0], x[1], x[2])
    pose_centered = se3.pose_matrix(R, x[3:6])
    return (
        se3.translation_matrix(center)
        @ pose_centered
        @ se3.translation_matrix(-center)
    )
