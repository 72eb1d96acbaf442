"""Distributed pose-graph refinement over a scan sequence.

The capstone beyond the reference's capabilities (BASELINE.json config 5):
the reference registers each ETH scan pair independently and never makes
the trajectory globally consistent. Here the pairwise ICP results become
edges of a pose graph over absolute scan poses, jointly refined by
Gauss-Newton — and the edge set shards across a device mesh, with the
6Vx6V normal equations reduced by ``psum`` over ICI (the Schur/reduction
step of distributed bundle adjustment).

Conventions
-----------
* ``poses[i]`` maps scan-i coordinates into world coordinates.
* An ICP run with source = scan j, target = scan i yields ``A_ij`` with
  ``p_i = A_ij p_j``; consistency demands ``T_i @ A_ij ~= T_j``.
* Edge residual: ``r = [log_SO3(R_err), t_err]`` of
  ``(T_i A_ij)^-1 T_j``, weighted per edge.

Gauge freedom is fixed by a strong prior on pose 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.core import se3


class PoseGraph(NamedTuple):
    """Edge list over V absolute poses (pytree; pad edges with weight 0)."""

    edge_i: jax.Array       # (E,) int32 target-scan index
    edge_j: jax.Array       # (E,) int32 source-scan index
    rel_poses: jax.Array    # (E, 4, 4) measured A_ij (p_i = A_ij p_j)
    weights: jax.Array      # (E,) edge confidence; 0 = padding


def _log_se3(T: jax.Array) -> jax.Array:
    """Approximate se(3) log: [log_SO3(R), t]. Exact for the rotation part;
    the translation uses the raw offset (standard for small-residual PGO)."""
    w = se3.matrix_to_axis_angle(T[:3, :3])
    return jnp.concatenate([w, T[:3, 3]])


def edge_residuals(
    x: jax.Array,            # (V, 6) per-pose increments
    base_poses: jax.Array,   # (V, 4, 4)
    graph: PoseGraph,
) -> jax.Array:
    """(E, 6) weighted residuals with increments applied from the left."""

    def one(ei, ej, rel, w):
        Ti = se3.increment_to_matrix(x[ei]) @ base_poses[ei]
        Tj = se3.increment_to_matrix(x[ej]) @ base_poses[ej]
        err = se3.invert_pose(Ti @ rel) @ Tj
        return w * _log_se3(err)

    return jax.vmap(one)(graph.edge_i, graph.edge_j, graph.rel_poses, graph.weights)


def refine(
    base_poses: jax.Array | np.ndarray,
    graph: PoseGraph,
    *,
    n_iterations: int = 10,
    damping: float = 1e-6,
    prior_weight: float = 1e4,
    axis_name: str | None = None,
) -> jax.Array:
    """Gauss-Newton pose-graph refinement; returns refined (V, 4, 4) poses.

    With ``axis_name`` set, ``graph`` holds this device's EDGE SHARD (zero
    weights pad ragged shards) and the JTJ/JTr reductions psum across the
    mesh axis; the small dense solve runs replicated.
    """
    base_poses = jnp.asarray(base_poses, jnp.float32)
    v = base_poses.shape[0]

    def gn_step(poses, _):
        x0 = jnp.zeros((v, 6), jnp.float32)

        def res_flat(xf):
            return edge_residuals(xf.reshape(v, 6), poses, graph).reshape(-1)

        r = res_flat(x0.reshape(-1))
        J = jax.jacfwd(res_flat)(x0.reshape(-1))      # (6E, 6V)
        jtj = J.T @ J
        g = J.T @ r
        if axis_name is not None:
            jtj = jax.lax.psum(jtj, axis_name)
            g = jax.lax.psum(g, axis_name)

        # Gauge prior: clamp pose 0 (block-diagonal weight on its increment).
        prior = jnp.zeros((6 * v,), jnp.float32).at[:6].set(prior_weight)
        jtj = jtj + jnp.diag(prior) + damping * jnp.eye(6 * v, dtype=jnp.float32)
        dx = -jnp.linalg.solve(jtj, g).reshape(v, 6)

        new_poses = jax.vmap(
            lambda inc, p: se3.increment_to_matrix(inc) @ p
        )(dx, poses)
        return new_poses, jnp.sum(r * r)

    poses, costs = jax.lax.scan(gn_step, base_poses, None, length=n_iterations)
    return poses


def refine_sharded(base_poses, graph: PoseGraph, mesh, *, n_iterations: int = 10):
    """Shard the edge set over the mesh's ``pairs`` axis and refine with
    psum-reduced normal equations. Edges are padded to a multiple of the
    axis size with zero-weight entries."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape["pairs"]
    e = graph.edge_i.shape[0]
    pad = (-e) % n_dev

    def pad_edge(arr, fill=0):
        width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, width, constant_values=fill)

    padded = PoseGraph(
        edge_i=pad_edge(graph.edge_i),
        edge_j=pad_edge(graph.edge_j),
        rel_poses=jnp.pad(
            graph.rel_poses, ((0, pad), (0, 0), (0, 0))
        ) + (jnp.eye(4)[None] * jnp.concatenate(
            [jnp.zeros((e,)), jnp.ones((pad,))]
        )[:, None, None] if pad else 0.0),
        weights=pad_edge(graph.weights, 0.0),
    )

    def local(poses, ei, ej, rel, w):
        return refine(
            poses, PoseGraph(ei, ej, rel, w),
            n_iterations=n_iterations, axis_name="pairs",
        )

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=P(),
    )
    return jax.jit(sharded)(
        jnp.asarray(base_poses, jnp.float32),
        padded.edge_i, padded.edge_j, padded.rel_poses, padded.weights,
    )


def sequential_graph(
    pair_poses: np.ndarray, weights: np.ndarray | None = None
) -> tuple[np.ndarray, PoseGraph]:
    """Build a chain pose graph from sequential pairwise ICP results.

    ``pair_poses[k]`` is the ICP estimate aligning scan k+1 onto scan k
    (``A_{k,k+1}``). Returns odometry-composed absolute poses (the
    initialization) and the graph.
    """
    pair_poses = np.asarray(pair_poses, np.float32)
    e = pair_poses.shape[0]
    v = e + 1
    abs_poses = [np.eye(4, dtype=np.float32)]
    for k in range(e):
        abs_poses.append(abs_poses[-1] @ pair_poses[k])
    if weights is None:
        weights = np.ones((e,), np.float32)
    graph = PoseGraph(
        edge_i=jnp.arange(e, dtype=jnp.int32),
        edge_j=jnp.arange(1, e + 1, dtype=jnp.int32),
        rel_poses=jnp.asarray(pair_poses),
        weights=jnp.asarray(weights, jnp.float32),
    )
    return np.stack(abs_poses), graph
