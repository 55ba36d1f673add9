"""Training infrastructure tests: optimizer freezing, plateau schedule,
checkpoint roundtrip, full train-step smoke on both stages."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment4d_tpu import smpl
from garment4d_tpu.data.synthetic import make_batch
from garment4d_tpu.models import CanonicalGarmentModel, GarmentAssets, PosedGarmentModel
from garment4d_tpu.train import checkpoint as ckpt_lib
from garment4d_tpu.train.state import PlateauScheduler
from garment4d_tpu.train.step import (
    body_inputs_from_batch,
    make_canonical_steps,
    make_posed_steps,
    make_state_for,
)


@pytest.fixture(scope="module")
def setup():
    assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)
    body_model = smpl.synthetic_smpl(num_verts=200)
    batch = make_batch(assets, body_model, batch_size=1, T=2, npoints=1536)
    return assets, body_model, batch


class TestPlateau:
    def test_reduces_after_patience(self):
        sched = PlateauScheduler(patience=2, factor=0.1)
        assert sched.update(1.0) == 1.0
        for _ in range(2):
            assert sched.update(1.0) == 1.0  # within patience
        assert sched.update(1.0) == pytest.approx(0.1)  # exceeded
        assert sched.update(0.5) == pytest.approx(0.1)  # improvement resets

    def test_improvement_resets_counter(self):
        sched = PlateauScheduler(patience=1, factor=0.5)
        sched.update(1.0)
        sched.update(0.9)
        sched.update(0.95)  # bad 1
        assert sched.update(0.8) == 1.0  # improved before patience exceeded

    @pytest.mark.parametrize("seed,patience,cooldown,threshold", [
        (0, 8, 0, 1e-4),   # the reference's exact configuration
        (1, 2, 0, 1e-4),
        (2, 3, 2, 1e-4),
        (3, 1, 1, 1e-2),
    ])
    def test_matches_torch_trace(self, seed, patience, cooldown, threshold):
        """LR trace parity against torch's ReduceLROnPlateau on random metric
        sequences (reference `train_temporal.py:131` uses
        `ReduceLROnPlateau(optimizer, 'min', patience=8)`)."""
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(seed)
        # noisy, slowly-plateauing metric sequence
        metrics = 1.0 / (1.0 + 0.1 * np.arange(80)) + 0.02 * rng.rand(80)

        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, "min", patience=patience, cooldown=cooldown,
            threshold=threshold)
        ours = PlateauScheduler(patience=patience, cooldown=cooldown,
                                threshold=threshold)
        for m in metrics:
            tsched.step(float(m))
            scale = ours.update(float(m))
            assert scale == pytest.approx(opt.param_groups[0]["lr"]), (
                f"diverged at metric {m}")


class TestCanonicalTrainStep:
    def test_loss_decreases(self, setup):
        assets, body_model, batch = setup
        model = CanonicalGarmentModel(assets=assets)
        variables = model.init(jax.random.PRNGKey(0), batch["pcd"], train=False)
        state = make_state_for(model, variables, assets, lr=1e-3)
        train_step, eval_step = make_canonical_steps(model, assets, body_model.faces)
        rng = jax.random.PRNGKey(1)
        first = None
        for i in range(4):
            state, losses = train_step(state, batch, jax.random.fold_in(rng, i))
            if first is None:
                first = float(losses["total_loss"])
        last = float(losses["total_loss"])
        assert np.isfinite(last)
        assert last < first  # overfits a single synthetic batch

    def test_eval_step_finite(self, setup):
        assets, body_model, batch = setup
        model = CanonicalGarmentModel(assets=assets)
        variables = model.init(jax.random.PRNGKey(0), batch["pcd"], train=False)
        state = make_state_for(model, variables, assets, lr=1e-3)
        _, eval_step = make_canonical_steps(model, assets, body_model.faces)
        losses = eval_step(state, batch)
        assert np.isfinite(float(losses["total_loss"]))

    def test_eval_mask_excludes_padding_duplicates(self, setup):
        """Metrics of a padded batch (tail duplicates masked out) must equal
        metrics of the unpadded batch - the exactness the reference's padding
        sampler (`utils/train_utils.py:12-31`) never had."""
        from garment4d_tpu.data.synthetic import make_batch

        assets, body_model, _ = setup
        b3 = make_batch(assets, body_model, batch_size=3, T=2, npoints=1536,
                        seed=11)
        # B=4 batch whose last sample duplicates sample 2 (eval-tail padding)
        b4 = {k: np.concatenate([np.asarray(v), np.asarray(v)[2:3]], axis=0)
              for k, v in b3.items()}
        b4["valid_mask"] = np.array([1.0, 1.0, 1.0, 0.0], np.float32)

        model = CanonicalGarmentModel(assets=assets)
        variables = model.init(jax.random.PRNGKey(0), b3["pcd"], train=False)
        state = make_state_for(model, variables, assets, lr=1e-3)
        _, eval_step = make_canonical_steps(model, assets, body_model.faces)
        plain = eval_step(state, b3)
        masked = eval_step(state, b4)
        for k in ("total_loss", "garment_msre", "sem_seg_loss",
                  "interpenetration_loss", "garment_lap_loss"):
            np.testing.assert_allclose(float(masked[k]), float(plain[k]),
                                       rtol=2e-5, err_msg=k)


class TestPosedTrainStep:
    def test_frozen_canonical_unchanged(self, setup):
        assets, body_model, batch = setup
        model = PosedGarmentModel(
            assets=assets,
            body_faces=body_model.faces,
            lbs_k=4, iterations=2)
        variables = model.init(jax.random.PRNGKey(0), batch["pcd"],
                               body_inputs_from_batch(batch), train=False)
        state = make_state_for(model, variables, assets, lr=1e-2,
                               freeze_canonical=True)
        train_step, _ = make_posed_steps(model, assets, body_model.faces)
        # copy to host before the step: train_step donates the state buffers
        before_canon = [np.asarray(x) for x in
                        jax.tree_util.tree_leaves(state.params["canonical"])]
        before_gcn = [np.asarray(x) for x in
                      jax.tree_util.tree_leaves(state.params["gcn0_0"])]
        state, losses = train_step(state, batch, jax.random.PRNGKey(2))
        after_canon = jax.tree_util.tree_leaves(state.params["canonical"])
        after_gcn = jax.tree_util.tree_leaves(state.params["gcn0_0"])
        for a, b in zip(before_canon, after_canon):
            np.testing.assert_array_equal(a, np.asarray(b))
        assert any(not np.allclose(a, np.asarray(b))
                   for a, b in zip(before_gcn, after_gcn))
        assert np.isfinite(float(losses["total_loss"]))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, setup, tmp_path):
        assets, body_model, batch = setup
        model = CanonicalGarmentModel(assets=assets)
        variables = model.init(jax.random.PRNGKey(0), batch["pcd"], train=False)
        state = make_state_for(model, variables, assets, lr=1e-3)
        train_step, _ = make_canonical_steps(model, assets, body_model.faces)
        state, _ = train_step(state, batch, jax.random.PRNGKey(3))

        ckpt_dir = str(tmp_path / "ckpt")
        ckpt_lib.save_checkpoint(ckpt_dir, state, epoch=7, other_state={"best_v_l2": 0.5})

        fresh = make_state_for(model, model.init(
            jax.random.PRNGKey(9), batch["pcd"], train=False), assets, lr=1e-3)
        restored, epoch, other = ckpt_lib.restore_checkpoint(ckpt_dir, fresh)
        assert epoch == 7
        assert float(other["best_v_l2"]) == 0.5
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)


class TestVariablesNpz:
    def test_roundtrip(self, tmp_path, rng):
        """save_variables_npz / load_variables_npz: the compact single-file
        format bench.py uses for the synthetic-trained weights."""
        from garment4d_tpu.train.checkpoint import (
            load_variables_npz,
            save_variables_npz,
        )

        variables = {
            "params": {"dense": {"kernel": rng.randn(4, 8).astype(np.float32),
                                 "bias": rng.randn(8).astype(np.float32)},
                       "gcn0_0": {"weight": rng.randn(8, 3).astype(np.float32)}},
            "batch_stats": {"bn": {"mean": rng.randn(8).astype(np.float32)}},
            "constants": {"pca": rng.randn(2, 2).astype(np.float32)},
        }
        path = str(tmp_path / "w.npz")
        save_variables_npz(path, variables)

        target = jax.tree_util.tree_map(np.zeros_like, variables)
        got = load_variables_npz(path, target)
        for coll in ("params", "batch_stats"):
            for a, b in zip(jax.tree_util.tree_leaves(got[coll]),
                            jax.tree_util.tree_leaves(variables[coll])):
                np.testing.assert_array_equal(a, b)
        # constants are NOT serialised (rebuilt from assets at init)
        assert np.all(got["constants"]["pca"] == 0)
