"""Subprocess body for the 2-process x 4-device jax.distributed test.

Run as: python tests/dist_worker.py <port> <process_id>

Each of the two processes provisions 4 virtual CPU devices, joins the
cluster through `parallel.launch.initialize_distributed` (the repo's
replacement for the reference's Slurm/torch.distributed bootstrap,
`utils/train_utils.py:49-92`), builds the global dp mesh over all 8
devices, feeds its LOCAL half of a deterministic global batch through
`shard_batch` (the `make_array_from_process_local_data` path that is
unreachable single-process), and runs one jitted grad step. The loss it
prints must equal the single-process value of the same global computation -
asserted here AND compared across processes by the parent test.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garment4d_tpu.parallel.launch import (  # noqa: E402
    initialize_distributed,
    per_process_batch,
)
from garment4d_tpu.parallel.mesh import (  # noqa: E402
    check_batch_divisible,
    make_mesh,
    shard_batch,
)

info = initialize_distributed(f"localhost:{port}", num_processes=2,
                              process_id=pid)
assert info["process_count"] == 2, info
assert info["local_devices"] == 4, info
assert info["global_devices"] == 8, info

mesh = make_mesh()
B, F = 16, 4
check_batch_divisible(B, mesh)
pb = per_process_batch(B)
assert pb == 8, pb

# deterministic GLOBAL batch; every process holds only its local rows
x = np.arange(B * F, dtype=np.float32).reshape(B, F) / (B * F)
y = np.sum(x, axis=1, keepdims=True)
local = slice(pid * pb, (pid + 1) * pb)
batch = shard_batch({"x": x[local], "y": y[local]}, mesh)

w0 = jnp.zeros((F, 1), jnp.float32)


@jax.jit
def step(w, b):
    def loss_fn(w_):
        return jnp.mean((b["x"] @ w_ - b["y"]) ** 2)

    loss, grad = jax.value_and_grad(loss_fn)(w)
    return loss, w - 0.5 * grad


loss, w1 = step(w0, batch)

# the same computation, single-replica, on the full global batch
want = float(np.mean((x @ np.zeros((F, 1)) - y) ** 2))
got = float(loss)
assert abs(got - want) < 1e-6, (got, want)
print(f"DIST_OK pid={pid} loss={got:.8f} wsum={float(jnp.sum(w1)):.8f}",
      flush=True)
