"""Child process for the 2-process jax.distributed test (test_multiprocess.py).

Run as: python tests/_mp_child.py <coordinator_address> <process_id>

Each process brings 2 virtual CPU devices (4 global), initializes the
cluster through the SAME code path train.py uses (env-driven
initialize_distributed), builds the global ('data','model') mesh, feeds a
data-sharded global batch through DeviceLoader's multi-process path
(process-local rows -> jax.make_array_from_process_local_data), and runs
a jitted global reduction, checking it equals the host-computed value of
the FULL global batch.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip()
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["ITCVAE_COORDINATOR_ADDRESS"] = sys.argv[1]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from intro_tc_vae_tpu.data import DeviceLoader, Synthetic  # noqa: E402
from intro_tc_vae_tpu.parallel import (  # noqa: E402
    batch_sharding,
    initialize_distributed,
    make_mesh,
)
from intro_tc_vae_tpu.parallel.distributed import local_batch_slice  # noqa: E402

assert initialize_distributed(
    num_processes=2, process_id=int(sys.argv[2])
), "distributed init did not trigger"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

mesh = make_mesh(4)
ds = Synthetic(image_size=16, cdim=3, sizes=(2, 2, 4, 4))

sl = local_batch_slice(8)
expected_slices = {0: slice(0, 4), 1: slice(4, 8)}
assert sl == expected_slices[jax.process_index()], sl

loader = DeviceLoader(
    ds, batch_size=8, shuffle=True, sharding=batch_sharding(mesh), seed=123
)
batch = next(iter(loader))
assert batch.shape == (8, 16, 16, 3)
assert len(batch.sharding.device_set) == 4

# host-side truth: every process knows the full global index order (same seed)
rng = np.random.RandomState(123)
order = np.arange(len(ds))
rng.shuffle(order)
host_batch = ds.get_batch(order[:8])

total = jax.jit(lambda x: (x * x).sum())(batch)  # cross-process reduction
np.testing.assert_allclose(
    float(total), float((host_batch * host_batch).sum()), rtol=1e-6
)

# scan-stacked path: [K, B, ...] with the data axis at axis 1; each process
# gathers only its own rows per scan step
loader2 = DeviceLoader(
    ds, batch_size=4, stack_steps=2, shuffle=True,
    sharding=batch_sharding(mesh, ndim=5, batch_axis=1), seed=7,
)
b2 = next(iter(loader2))
assert b2.shape == (2, 4, 16, 16, 3), b2.shape
rng2 = np.random.RandomState(7)
order2 = np.arange(len(ds))
rng2.shuffle(order2)
host2 = ds.get_batch(order2[:8]).reshape(2, 4, 16, 16, 3)
total2 = jax.jit(lambda x: (x * x).sum())(b2)
np.testing.assert_allclose(float(total2), float((host2 * host2).sum()),
                           rtol=1e-6)

print(f"mp-child {jax.process_index()}: OK total={float(total):.4f}")
