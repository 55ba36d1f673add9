"""High-level API tests."""

import numpy as np
import pytest

from garment4d_tpu import smpl
from garment4d_tpu.api import GarmentReconstructor
from garment4d_tpu.data.synthetic import make_batch
from garment4d_tpu.models import GarmentAssets
from garment4d_tpu.train.step import body_inputs_from_batch


@pytest.fixture(scope="module")
def recon():
    assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)
    body_model = smpl.synthetic_smpl(num_verts=200)
    return (GarmentReconstructor.from_assets(
        assets, body_model, lbs_k=4, iterations=2,
        example_shape=(1, 2, 1536)), assets, body_model)


class TestApi:
    def test_posed_and_canonical(self, recon):
        r, assets, body_model = recon
        batch = make_batch(assets, body_model, batch_size=1, T=2, npoints=1536,
                           seed=3)
        posed = r.posed(batch["pcd"], body_inputs_from_batch(batch))
        assert posed.shape == (1, 2, assets.num_verts, 3)
        assert np.isfinite(posed).all()
        canon = r.canonical(batch["pcd"])
        assert canon.shape == (1, assets.num_verts, 3)
        seg = r.segment(batch["pcd"])
        assert seg.shape == (1, 2, 1536)
        assert seg.min() >= 0 and seg.max() <= 6
