"""Probe AA-ICP safeguard variants (CPU).

Variants of the growth safeguard, evaluated on (a) the bunny pair with its
tight 0.0003 match threshold (piecewise-noisy G near convergence — the
regime that broke raw AA) and (b) a 6-dim linear contraction with rho~0.9
(the regime AA must keep accelerating):

  reset  — on growth drop history, take the plain step (round-2 original)
  clampC — reset + cap the AA correction at C * ||f_k|| (trust region
           around the plain step; C must stay >= ~1/(1-rho) to keep the
           linear case fast)
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from icp_variants_tpu.core import se3  # noqa: E402


def pose_to_vec(pose):
    w = se3.matrix_to_axis_angle(pose[:3, :3])
    return jnp.concatenate([w, pose[:3, 3]])


def vec_to_pose(x):
    return se3.pose_matrix(se3.axis_angle_to_matrix(x[:3]), x[3:])


def make_step(m, clamp=0.0, sticky=0, decay=False):
    def step(state, x_k, g_k):
        xs, fs, count, prev_norm, grews = state
        f_k = g_k - x_k
        norm = jnp.sum(f_k * f_k)
        grew = norm > prev_norm
        grews = grews + grew.astype(jnp.int32)
        count = jnp.where(grew, 0, count)
        xs = jnp.roll(xs, -1, axis=0).at[-1].set(x_k)
        fs = jnp.roll(fs, -1, axis=0).at[-1].set(f_k)
        count = jnp.minimum(count + 1, m + 1)
        dF = (fs[1:] - fs[:-1]).T
        dG = ((xs[1:] + fs[1:]) - (xs[:-1] + fs[:-1])).T
        col = jnp.arange(m)
        valid = col >= (m - (count - 1))
        dF = jnp.where(valid[None, :], dF, 0.0)
        dG = jnp.where(valid[None, :], dG, 0.0)
        A = dF.T @ dF
        ridge = 1e-10 * (jnp.trace(A) + 1.0)
        gamma = jnp.linalg.solve(A + ridge * jnp.eye(m, dtype=A.dtype),
                                 dF.T @ f_k)
        x_aa = g_k - dG @ gamma
        if clamp > 0:
            eff = clamp * (0.5 ** grews) if decay else clamp
            delta = x_aa - g_k
            dn = jnp.sqrt(jnp.sum(delta * delta)) + 1e-30
            scale = jnp.minimum(1.0, eff * jnp.sqrt(norm) / dn)
            x_aa = g_k + scale * delta
        x_next = jnp.where(count > 1, x_aa, g_k)
        if sticky > 0:
            x_next = jnp.where(grews >= sticky, g_k, x_next)
        return (xs, fs, count, norm, grews), x_next

    return step


def init(m):
    return (jnp.zeros((m + 1, 6), jnp.float32),
            jnp.zeros((m + 1, 6), jnp.float32),
            jnp.asarray(0, jnp.int32), jnp.asarray(np.inf, jnp.float32),
            jnp.asarray(0, jnp.int32))


def run_linear(step, m, iters=12):
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    A = (Q * rng.uniform(0.5, 0.9, 6)) @ Q.T
    b = rng.standard_normal(6)
    x_star = np.linalg.solve(np.eye(6) - A, b)

    def G(x):
        return jnp.asarray(A, jnp.float32) @ x + jnp.asarray(b, jnp.float32)

    x = jnp.zeros(6, jnp.float32)
    st = init(m)
    xp = jnp.zeros(6, jnp.float32)
    for _ in range(iters):
        xp = G(xp)
        st, x = step(st, x, G(x))
    return (np.linalg.norm(np.asarray(x) - x_star),
            np.linalg.norm(np.asarray(xp) - x_star))


def run_bunny(step, m):
    from icp_variants_tpu.data.loaders import BunnyDataLoader
    from icp_variants_tpu.pipeline import icp
    from icp_variants_tpu.workloads import bunny as bw

    cfg = bw.default_config()
    loader = BunnyDataLoader()
    sample = loader.get_item(0)
    source, target = sample.source, sample.target
    gs, gtp = loader.gt_correspondences()
    gv = np.ones((len(gs),), bool)

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, cfg.n_iterations)
    from icp_variants_tpu.core import cloud as cloud_lib
    strides = cloud_lib.multires_stride_schedule(
        int(np.asarray(source.num_valid())), cfg.n_iterations,
        cfg.multi_resolution, cfg.multi_resolution_min_points)

    pose = jnp.eye(4)
    st = init(m)
    rmses = []
    for i in range(cfg.n_iterations):
        new_pose, _, rec = icp._iteration(
            cfg, source, target, pose, jnp.asarray(strides[i]), keys[i],
            jnp.asarray(gs), jnp.asarray(gtp), jnp.asarray(gv), False)
        if m > 0:
            st, xn = step(st, pose_to_vec(pose), pose_to_vec(new_pose))
            pose = vec_to_pose(xn)
        else:
            pose = new_pose
        rmses.append(float(rec.rmse))
    return rmses


if __name__ == "__main__":
  for M in (2, 3, 5):
      print("== m =", M)
      for name, mk in [
          ("plain", None),
          ("reset", lambda m: make_step(m)),
          ("clamp5", lambda m: make_step(m, clamp=5.0)),
          ("c5dec", lambda m: make_step(m, clamp=5.0, decay=True)),
          ("c10dec", lambda m: make_step(m, clamp=10.0, decay=True)),
          ("c20dec", lambda m: make_step(m, clamp=20.0, decay=True)),
      ]:
          if mk is None:
              r = run_bunny(None, 0)
              print(f"{name:8s} bunny final={r[-1]:.5f} min={min(r):.5f}")
              continue
          m = M
          ea, ep = run_linear(mk(m), m)
          r = run_bunny(mk(m), m)
          it_hit = next((i for i, v in enumerate(r) if v <= 0.00345), -1)
          print(f"{name:8s} linear aa={ea:.2e} plain={ep:.2e}  "
                f"bunny final={r[-1]:.5f} min={min(r):.5f} hit14@{it_hit}")
          if "dec" in name:
              print("   curve:", " ".join(f"{v:.4f}" for v in r))
