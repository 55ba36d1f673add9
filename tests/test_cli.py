"""End-to-end CLI smokes on synthetic data (all stages / flags)."""

import shutil

import numpy as np
import pytest

import train_temporal


def run_cli(tmp_path, extra, epochs=1):
    out = str(tmp_path / "out")
    shutil.rmtree(out, ignore_errors=True)
    args = ["--config", "cfgs/skirt.yaml", "--synthetic_data", "1",
            "--batch_size", "1", "--T", "2", "--npoints", "1536",
            "--epoch_num", str(epochs), "--output_dir", out] + extra
    return train_temporal.main(args)


class TestCli:
    def test_canonical_stage(self, tmp_path):
        hist = run_cli(tmp_path, ["--GarmentPCA", "1"])
        assert len(hist) == 1
        assert np.isfinite(hist[0]["train"]["total_loss"])

    def test_only_seg(self, tmp_path):
        hist = run_cli(tmp_path, ["--GarmentPCA", "1", "--only_seg", "1"])
        assert "sem_seg_loss" in hist[0]["train"]
        assert "garment_l2_loss" not in hist[0]["train"]

    def test_posed_stage_fix_pca(self, tmp_path):
        hist = run_cli(tmp_path, ["--GarmentPCALBS", "1", "--fix_PCA", "1"])
        assert "lbs_garment_msre" in hist[0]["eval"]

    def test_mgn_variant(self, tmp_path):
        hist = run_cli(tmp_path, ["--GarmentPCALBS", "1", "--MGN", "1",
                                  "--fix_PCA", "1"])
        assert "only_lbs_garment_msre" in hist[0]["eval"]

    def test_only_eval(self, tmp_path):
        means = run_cli(tmp_path, ["--GarmentPCALBS", "1", "--only_eval", "1"])
        assert "lbs_garment_msre" in means
