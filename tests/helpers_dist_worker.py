"""Worker for tests/test_distributed.py — one process of a 2-process
(multi-host-style) mesh.  Run as:

    python tests/helpers_dist_worker.py <port> <process_id>

Builds the Burgers continuous-inference loss on a global (hosts, data)
mesh — points sharded across processes, params/data replicated — and
checks jitted loss AND parameter gradients against the process-local
single-controller oracle.  Prints ``DIST OK`` on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

port, proc = int(sys.argv[1]), int(sys.argv[2])

from pinn.parallel import distributed as dist  # noqa: E402

dist.init_distributed(f"localhost:{port}", num_processes=2,
                      process_id=proc)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pinn.models import mlp  # noqa: E402
from pinn.problems import burgers  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
mesh = dist.make_multihost_mesh()
assert mesh.devices.shape == (2, jax.local_device_count())

# Deterministic inputs, identical on both processes (the reference's
# same-seed-everywhere contract).
rng = np.random.RandomState(1234)
N_f, N_u = 64, 16
X_f_all = rng.uniform([-1.0, 0.0], [1.0, 1.0], size=(N_f, 2))
X_u = rng.uniform([-1.0, 0.0], [1.0, 1.0], size=(N_u, 2))
u = np.sin(np.pi * X_u[:, :1])
lb, ub = jnp.array([-1.0, 0.0]), jnp.array([1.0, 1.0])
nu = 0.01 / np.pi
params = mlp.init_mlp(jax.random.PRNGKey(0), [2, 8, 8, 1], jnp.float32)

# Global placement: this process contributes its half of the points.
half = N_f // 2
X_f_g = dist.shard_points_multihost(X_f_all[proc * half:(proc + 1) * half],
                                    mesh)
X_u_g = dist.replicate_multihost(X_u.astype(np.float32), mesh)
u_g = dist.replicate_multihost(u.astype(np.float32), mesh)
params_g = jax.tree_util.tree_map(
    lambda a: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(a), a.shape), params)


def loss(p, X_u_, u_, X_f_):
    return burgers.loss_cont_inference(p, X_u_, u_, X_f_, lb, ub, nu)


vg = jax.jit(jax.value_and_grad(loss),
             out_shardings=(NamedSharding(mesh, P()),
                            jax.tree_util.tree_map(
                                lambda _: NamedSharding(mesh, P()), params)))
val, grads = vg(params_g, X_u_g, u_g, X_f_g)

# Single-controller oracle on this process's own devices (full batch).
val0, grads0 = jax.value_and_grad(loss)(
    params, jnp.asarray(X_u, jnp.float32), jnp.asarray(u, jnp.float32),
    jnp.asarray(X_f_all, jnp.float32))

np.testing.assert_allclose(float(val), float(val0), rtol=1e-6)
for g, g0 in zip(jax.tree_util.tree_leaves(grads),
                 jax.tree_util.tree_leaves(grads0)):
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                               rtol=1e-5, atol=1e-7)
print(f"DIST OK proc={proc} loss={float(val):.6e}", flush=True)
