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


@pytest.fixture(scope="module")
def disk_fixture(tmp_path_factory):
    """A full on-disk mini-CLOTH3D tree + SMPL npz + config yaml, so the CLI
    exercises the REAL data branch (Cloth3dDataset + ParallelItemLoader +
    eval-tail padding) end-to-end."""
    import os
    import pickle

    from garment4d_tpu import smpl
    from garment4d_tpu.data.fixture import write_fixture
    from garment4d_tpu.data.obj_io import write_obj
    from garment4d_tpu.models import GarmentAssets

    root = str(tmp_path_factory.mktemp("cloth3d_cli"))
    assets = GarmentAssets.synthetic(name="Skirt", num_rings=8, ring_size=12)
    lists = write_fixture(root, assets, num_seqs=2, frames_per_seq=6)

    # the registered-template assets the real branch loads via
    # GarmentAssets.from_files (reference `mesh_encoder.py:89-99`)
    reg = os.path.join(root, "Skirt_reg")
    write_obj(os.path.join(reg, "Skirt_template.obj"),
              np.asarray(assets.template_v), [list(f) for f in assets.faces])
    with open(os.path.join(reg, "PCABase_SS.pkl"), "wb") as f:
        pickle.dump({
            "components": np.asarray(assets.pca_components),
            "mean": np.asarray(assets.pca_mean),
            "explained": np.asarray(assets.pca_explained),
            "ss_scale": np.asarray(assets.pca_scale)}, f)

    smpl_dir = os.path.join(root, "smpl_models")
    os.makedirs(smpl_dir)
    for s, gender in enumerate(("male", "female")):
        m = smpl.synthetic_smpl(num_verts=300, seed=s)
        np.savez(os.path.join(smpl_dir, f"SMPL_{gender.upper()}.npz"),
                 v_template=np.asarray(m.v_template),
                 shapedirs=np.asarray(m.shapedirs),
                 posedirs=np.asarray(m.posedirs),
                 J_regressor=np.asarray(m.J_regressor),
                 lbs_weights=np.asarray(m.lbs_weights),
                 parents=np.asarray(m.parents),
                 faces=np.asarray(m.faces))

    cfg_path = os.path.join(root, "fixture.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""_BASE_CONFIG_: cfgs/skirt.yaml
NETWORK:
  LBSK: 16
  NPOINTS: 512
DATASET:
  ROOT_FOLDER: {root}
  TRAIN_F_LIST: {lists["train"]}
  EVAL_F_LIST: {lists["eval"]}
  EXCLUDE_SEQ_LIST: ""
""")
    return root, cfg_path, smpl_dir


class TestCliDiskFixture:
    def _run(self, tmp_path, disk_fixture, workers, tag, extra=()):
        root, cfg_path, smpl_dir = disk_fixture
        out = str(tmp_path / f"out_{tag}")
        args = ["--config", cfg_path, "--GarmentPCALBS", "1",
                "--batch_size", "2", "--T", "3", "--epoch_num", "1",
                "--num_workers", str(workers),
                "--smpl_model_dir", smpl_dir, "--output_dir", out] + list(extra)
        return train_temporal.main(args)

    def test_real_branch_trains(self, tmp_path, disk_fixture):
        hist = self._run(tmp_path, disk_fixture, workers=2, tag="train")
        assert np.isfinite(hist[0]["train"]["total_loss"])
        assert "lbs_garment_msre" in hist[0]["eval"]

    def test_workers_deterministic(self, tmp_path, disk_fixture):
        """Threaded item loading is bit-deterministic vs synchronous reads
        (eval-only: train windows are intentionally random per epoch, so the
        comparison isolates the loader). Guards the thread-safety of the
        seeded RNG replays in `data/cloth3d.py`."""
        m2 = self._run(tmp_path, disk_fixture, workers=2, tag="ew2",
                       extra=["--only_eval", "1"])
        m0 = self._run(tmp_path, disk_fixture, workers=0, tag="ew0",
                       extra=["--only_eval", "1"])
        for k, v in m2.items():
            assert m0[k] == pytest.approx(v, rel=1e-6), k


class TestDemos:
    def test_smpl_demo(self, tmp_path):
        """The smplx examples equivalent (demos/smpl_demo.py, reference
        `smplx/examples/demo.py:26-80`) runs headless and exports the mesh,
        preview image, and joints."""
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = str(tmp_path / "smpl_demo")
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "demos", "smpl_demo.py"),
             "--cpu", "--plot-joints", "--pose", "random", "--out", out],
            capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "Vertices shape = (890, 3)" in proc.stdout
        assert "Joints shape = (24, 3)" in proc.stdout
        for name in ("body.obj", "body_preview.png", "joints.ply"):
            assert os.path.exists(os.path.join(out, name)), name
