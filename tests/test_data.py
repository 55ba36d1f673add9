"""End-to-end data pipeline tests on a generated mini-CLOTH3D fixture."""

import numpy as np
import pytest

from garment4d_tpu import smpl
from garment4d_tpu.data.cloth3d import (
    Cloth3dDataset,
    Cloth3dPaths,
    finalize_batch,
    sample_choice,
)
from garment4d_tpu.data.fixture import write_fixture
from garment4d_tpu.models import GarmentAssets


def reference_random_sample(pcd, n, retain_order=False):
    """Inline copy of the documented random_sample_pcd behaviour for checking
    sample_choice (reference `dataloader.py:26-48`)."""
    np.random.seed(0)
    if n == pcd.shape[0]:
        choice = np.arange(0, pcd.shape[0], dtype=np.int32)
    elif n < pcd.shape[0]:
        choice = np.random.choice(np.arange(0, pcd.shape[0], dtype=np.int32), n,
                                  replace=False)
        if retain_order:
            choice = np.sort(choice)
    else:
        replace = n - pcd.shape[0] > pcd.shape[0]
        choice = np.concatenate([
            np.arange(0, pcd.shape[0], dtype=np.int32),
            np.random.choice(np.arange(0, pcd.shape[0], dtype=np.int32),
                             n - pcd.shape[0], replace=replace)], axis=0)
    if not retain_order:
        np.random.shuffle(choice)
    return pcd[choice, :], choice


class TestSampleChoice:
    @pytest.mark.parametrize("n_in,n", [(100, 50), (50, 100), (64, 64), (10, 25)])
    def test_matches_reference_semantics(self, n_in, n):
        pcd = np.random.RandomState(3).randn(n_in, 3)
        _, want = reference_random_sample(pcd, n)
        got = sample_choice(n_in, n)
        np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cloth3d"))
    assets = GarmentAssets.synthetic(name="Skirt", num_rings=8, ring_size=12)
    lists = write_fixture(root, assets, num_seqs=2, frames_per_seq=6)
    return root, assets, lists


class TestCloth3dPipeline:
    def test_dataset_windows(self, fixture_dir):
        root, assets, lists = fixture_dir
        paths = Cloth3dPaths(
            root=root, garment_folder="Skirt_reg",
            template_prefix=f"{root}/CLOTH3D_template")
        ds = Cloth3dDataset(paths, lists["eval"], "Skirt", T=3, npoints=512,
                            is_train=False, body_verts=300)
        assert len(ds) > 0
        # eval windows are contiguous and padded
        assert all(len(w) == 3 for w in ds.windows)

    def test_raw_item_and_finalize(self, fixture_dir):
        root, assets, lists = fixture_dir
        paths = Cloth3dPaths(
            root=root, garment_folder="Skirt_reg",
            template_prefix=f"{root}/CLOTH3D_template")
        T, N, Vb = 3, 512, 300
        ds = Cloth3dDataset(paths, lists["eval"], "Skirt", T=T, npoints=N,
                            is_train=False, body_verts=Vb, pca_dim=64)
        raw0 = ds.raw_item(0)
        raw1 = ds.raw_item(1)
        assert raw0["pose"].shape == (T, 72)
        assert raw0["garment_pcd"].shape == (T, N, 3)
        assert raw0["garment"].shape == (T, assets.num_verts, 3)
        assert raw0["pca_coeff"].shape == (64,)

        body = smpl.synthetic_smpl(num_verts=Vb)
        batch = ds.collate([raw0, raw1])
        final = finalize_batch(batch, {"male": body, "female": body})
        B = 2
        assert final["pcd"].shape == (B, T, N, 3)
        assert final["pcd_label"].shape == (B, T, N)
        assert final["smpl_vertices"].shape == (B, T, Vb, 3)
        assert final["tpose_smpl_vertices"].shape == (B, Vb, 3)
        assert final["J_regressor"].shape == (B, T, 24, Vb)
        labels = np.asarray(final["pcd_label"])
        assert labels.min() >= 0 and labels.max() <= 6
        # body label (0 after shift) and skirt label (1) both present
        assert (labels == 0).any() and (labels == 1).any()
        assert np.isfinite(np.asarray(final["pcd"])).all()

    def test_train_windows_random_skips(self, fixture_dir):
        root, assets, lists = fixture_dir
        paths = Cloth3dPaths(
            root=root, garment_folder="Skirt_reg",
            template_prefix=f"{root}/CLOTH3D_template")
        ds = Cloth3dDataset(paths, lists["train"], "Skirt", T=3, npoints=512,
                            is_train=True, body_verts=300,
                            rng=np.random.RandomState(0))
        assert len(ds) > 0
        for w in ds.windows:
            frames = [int(x.split("/")[1]) for x in w]
            assert frames == sorted(frames)
            assert len(set(frames)) == len(frames)  # strictly increasing


class TestLoaderCaches:
    """The memoised index draws and per-sequence reads must be value-exact
    vs the uncached forms (they exist only because the reference's
    seed(0)-per-call makes the draws pure functions of the sizes)."""

    def test_cached_choices_exact(self):
        from garment4d_tpu.data.cloth3d import (
            _body_shuffle_choice,
            _cached_body_shuffle,
            _cached_sample_choice,
            sample_choice,
        )

        np.testing.assert_array_equal(
            _cached_sample_choice(7000, 6890), sample_choice(7000, 6890))
        np.testing.assert_array_equal(
            _cached_sample_choice(512, 256), sample_choice(512, 256))
        np.testing.assert_array_equal(
            _cached_body_shuffle(6890, 7000, 6890),
            _body_shuffle_choice(6890, 7000, 6890))

    def test_raw_item_deterministic_across_cache_states(self, fixture_dir):
        root, assets, lists = fixture_dir
        paths = Cloth3dPaths(
            root=root, garment_folder="Skirt_reg",
            template_prefix=f"{root}/CLOTH3D_template")
        ds = Cloth3dDataset(paths, lists["eval"], "Skirt", T=3, npoints=512,
                            is_train=False, body_verts=300)
        cold = ds.raw_item(0)   # fills the per-sequence cache
        warm = ds.raw_item(0)   # served from it
        assert cold.keys() == warm.keys()
        for k in cold:
            np.testing.assert_array_equal(np.asarray(cold[k]),
                                          np.asarray(warm[k]), err_msg=k)
