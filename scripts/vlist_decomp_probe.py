"""Decompose _visit_lists_from cost on TPU at warm shapes (40x512, B=16)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "warm_stage_log.txt")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n"); f.flush(); os.fsync(f.fileno())

import numpy as np, jax, jax.numpy as jnp

B, NQT, NC = 16, 40, 512
rng = np.random.default_rng(0)
lb = jnp.asarray(rng.uniform(0, 20, (B, NQT, NC)).astype(np.float32))
member = jnp.asarray(rng.random((B, NQT, NC)) < 0.06)
bound = jnp.full((B, NQT, 1), 10.0, jnp.float32)

def scan20(fn):
    def run(*a):
        def body(c, _):
            out = fn(a[0] + c*1e-6, *a[1:])
            return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
        _, outs = jax.lax.scan(body, 0.0, None, length=20)
        return outs
    return jax.jit(run)

def timeit(name, fn, *a):
    t0 = time.perf_counter(); out = fn(*a)
    jax.device_get(jax.tree.leaves(out)[0]); tc = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*a)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter()-t0)/3/20*1000
    log(f"{name:30s}: {dt:8.3f} ms/iter-batch ({dt/B:6.3f}/pair, compile {tc:.0f}s)")

NBINS = 8
def binpos(lb, member, bound_val):
    scale = jnp.sqrt(jnp.maximum(lb, 0.0) / jnp.maximum(bound_val, 1e-30))
    binid = jnp.clip((scale * NBINS).astype(jnp.int32), 0, NBINS - 1)
    onehot = ((binid[..., None] == jnp.arange(NBINS)[None, None, :]) & member[..., None]).astype(jnp.int32)
    rank_in_bin = jnp.cumsum(onehot, axis=1) - onehot
    bin_counts = jnp.sum(onehot, axis=1)
    bin_offsets = jnp.cumsum(bin_counts, axis=1) - bin_counts
    pos = jnp.sum(onehot * (bin_offsets[:, None, :] + rank_in_bin), axis=-1)
    return pos, binid

def upto_pos(lb, member, bound):
    pos, binid = binpos(lb, member, bound)
    return pos[..., :1].astype(jnp.float32) + binid[..., :1].astype(jnp.float32)

def full_lists(lb, member, bound):
    from icp_variants_tpu.ops import knn
    v, s, c, c0 = jax.vmap(knn._visit_lists_from)(lb, member, bound)
    return v[..., :1].astype(jnp.float32) + s[..., :1]

def scatter_only(lb, member, bound):
    pos, _ = binpos(lb, member, bound)
    def one(pos, member, lb):
        nqt, ntt = member.shape
        rows = jnp.broadcast_to(jnp.arange(nqt)[:, None], (nqt, ntt))
        cols = jnp.broadcast_to(jnp.arange(ntt)[None, :], (nqt, ntt))
        slot = jnp.where(member, pos, ntt)
        vlist = jnp.zeros((nqt, ntt), jnp.int32)
        vlist = vlist.at[rows.reshape(-1), slot.reshape(-1)].set(cols.reshape(-1).astype(jnp.int32), mode="drop")
        lblist = jnp.full((nqt, ntt), 1e30, jnp.float32)
        lblist = lblist.at[rows.reshape(-1), slot.reshape(-1)].set(lb.reshape(-1), mode="drop")
        return vlist, lblist
    v, l = jax.vmap(one)(pos, member, lb)
    return v[..., :1].astype(jnp.float32) + l[..., :1]

def suffix_only(lb, member, bound):
    s = jax.lax.cummin(lb, axis=2, reverse=True)
    return s[..., :1]

timeit("binpos (onehot+cumsums)", scan20(upto_pos), lb, member, bound)
timeit("scatter (pos->lists)", scan20(scatter_only), lb, member, bound)
timeit("suffix cummin", scan20(suffix_only), lb, member, bound)
timeit("full _visit_lists_from", scan20(full_lists), lb, member, bound)
log("done")
