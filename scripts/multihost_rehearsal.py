"""2-process CPU rehearsal of the multi-host path (BASELINE north-star:
>= 80% scaling on 2 hosts — unmeasurable on this 1-chip machine, so the
CODE PATH is exercised instead: jax.distributed bring-up, a global
cross-process mesh, and one sharded ICP step whose psums cross the
process boundary).

Usage (the test launches both):
    python scripts/multihost_rehearsal.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icp_variants_tpu.parallel import distributed, sharded_icp  # noqa: E402
from icp_variants_tpu.pipeline.config import (  # noqa: E402
    ICPConfig, Metric, Minimizer,
)

ok = distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=proc_id)
assert ok, "distributed.initialize returned single-process mode"
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

# pairs axis spans processes (DCN analog); points axis stays within a host.
mesh = distributed.global_mesh(points_per_pair=2)
assert mesh.shape == {"pairs": 4 * nproc // 2, "points": 2}

cfg = ICPConfig(
    metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR, max_distance=1.0
)
n_pairs, cap = mesh.shape["pairs"], 512
rng = np.random.default_rng(0)  # same seed everywhere: replicated host data
src = rng.standard_normal((n_pairs, cap, 3)).astype(np.float32) * 0.1
nrm = rng.standard_normal((n_pairs, cap, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=2, keepdims=True)
col = rng.integers(0, 256, (n_pairs, cap, 4)).astype(np.float32)
valid = np.ones((n_pairs, cap), bool)
tgt = src + 0.01

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

step = sharded_icp.make_sharded_icp_step(cfg, mesh)


def make_global(spec, x):
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


args = [make_global(P("pairs", "points"), a) for a in (src, nrm, col, valid)]
args += [make_global(P("pairs"), a) for a in (tgt, nrm, col, valid)]
poses = make_global(
    P("pairs"), np.tile(np.eye(4, dtype=np.float32), (n_pairs, 1, 1))
)
keys = make_global(
    P("pairs"), np.asarray(jax.random.split(jax.random.PRNGKey(0), n_pairs))
)

out = step(*args, poses, keys)
jax.block_until_ready(out)
local = np.stack([np.asarray(s.data) for s in out.addressable_shards])
assert np.isfinite(local).all()
print(f"REHEARSAL OK process={proc_id}/{nproc} devices={jax.device_count()}",
      flush=True)
