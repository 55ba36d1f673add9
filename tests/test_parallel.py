"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment4d_tpu import smpl
from garment4d_tpu.data.synthetic import make_batch
from garment4d_tpu.models import CanonicalGarmentModel, GarmentAssets
from garment4d_tpu.parallel.launch import initialize_distributed, per_process_batch
from garment4d_tpu.parallel.mesh import (
    batch_sharding,
    check_batch_divisible,
    make_mesh,
    shard_batch,
)
from garment4d_tpu.train.step import make_canonical_steps, make_state_for


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8

    def test_launch_single_host_noop(self):
        info = initialize_distributed()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8
        assert per_process_batch(16) == 16

    def test_batch_divisibility_check(self):
        mesh = make_mesh()
        check_batch_divisible(8, mesh)
        with pytest.raises(AssertionError):
            check_batch_divisible(3, mesh)

    def test_sharded_train_step_matches_single_device(self):
        assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)
        body_model = smpl.synthetic_smpl(num_verts=200)
        batch = make_batch(assets, body_model, batch_size=8, T=2, npoints=1536)
        model = CanonicalGarmentModel(assets=assets)
        variables = model.init(jax.random.PRNGKey(0), batch["pcd"], train=False)
        train_step, eval_step = make_canonical_steps(
            model, assets, body_model.faces)

        # single-device eval
        state = make_state_for(model, variables, assets, lr=1e-3)
        single = eval_step(state, batch)

        # dp-sharded eval over the 8-device mesh
        mesh = make_mesh()
        with mesh:
            sharded = shard_batch(batch, mesh)
            multi = eval_step(state, sharded)

        np.testing.assert_allclose(
            float(single["total_loss"]), float(multi["total_loss"]),
            rtol=2e-4, atol=1e-5)

    def test_sharding_actually_distributes(self):
        mesh = make_mesh()
        x = jnp.zeros((8, 4, 3))
        with mesh:
            sharded = jax.device_put(x, batch_sharding(mesh))
        assert len(sharded.sharding.device_set) == 8
