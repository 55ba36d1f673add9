"""Torch-checkpoint importer tests.

Builds a synthetic torch state_dict with the reference's exact key naming
(module tree of PCALBSGarmentUseSegEncoderSeg, see SURVEY.md 2.2) and checks
every key maps onto the flax tree with the right transform.
"""

import numpy as np
import jax
import pytest

from garment4d_tpu import smpl
from garment4d_tpu.data.synthetic import make_batch
from garment4d_tpu.models import GarmentAssets, PosedGarmentModel
from garment4d_tpu.train.step import body_inputs_from_batch
from garment4d_tpu.train.torch_import import import_torch_checkpoint, map_torch_key


def flax_path_to_torch_key(coll, path):
    """Inverse of map_torch_key for the posed model (test oracle)."""
    parts = list(path)
    prefix = ""
    if parts[0] == "canonical":
        prefix = "PCA_garment_encoder."
        parts = parts[1:]

    def bn_param(leaf):
        return {"scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}[leaf]

    def conv_param(leaf):
        return {"kernel": "weight", "bias": "bias"}[leaf]

    sa_idx = {"sa1": "0", "sa2": "1", "sa3": "2"}
    fp_idx = {"fp1": "0", "fp2": "1", "fp3": "2"}
    ge_idx = {"garment_sa1": "0", "garment_sa2": "1"}

    if parts[0] == "pointnet":
        mod = parts[1]
        if mod in sa_idx:
            mlp, layer, kind, leaf = parts[2], parts[3], parts[4], parts[5]
            s = mlp[3:]
            tail = (f"conv.{conv_param(leaf)}" if kind == "conv"
                    else f"bn.bn.{bn_param(leaf)}")
            return f"{prefix}pointnet.SA_modules.{sa_idx[mod]}.mlps.{s}.{layer}.{tail}"
        if mod in fp_idx:
            layer, kind, leaf = parts[3], parts[4], parts[5]
            tail = (f"conv.{conv_param(leaf)}" if kind == "conv"
                    else f"bn.bn.{bn_param(leaf)}")
            return f"{prefix}pointnet.FP_modules.{fp_idx[mod]}.mlp.{layer}.{tail}"
        if mod == "head0":
            kind, leaf = parts[2], parts[3]
            tail = (f"conv.{conv_param(leaf)}" if kind == "conv"
                    else f"bn.bn.{bn_param(leaf)}")
            return f"{prefix}pointnet.FC_layer.0.{tail}"
        if mod == "head1":
            return f"{prefix}pointnet.FC_layer.2.conv.{conv_param(parts[3])}"
        raise KeyError(path)
    if parts[0] in ge_idx:
        mlp, layer, kind, leaf = parts[1], parts[2], parts[3], parts[4]
        s = mlp[3:]
        tail = (f"conv.{conv_param(leaf)}" if kind == "conv"
                else f"bn.bn.{bn_param(leaf)}")
        return f"{prefix}GarmentEncoder.{ge_idx[parts[0]]}.mlps.{s}.{layer}.{tail}"
    if parts[0] == "garment_summarize":
        mlp, layer, kind, leaf = parts[1], parts[2], parts[3], parts[4]
        tail = (f"conv.{conv_param(leaf)}" if kind == "conv"
                else f"bn.bn.{bn_param(leaf)}")
        return f"{prefix}GarmentSummarize.mlps.{mlp[3:]}.{layer}.{tail}"
    if parts[0].startswith("pca_head"):
        head_conv = {"pca_head0": "0", "pca_head1": "3", "pca_head2": "6"}
        head_bn = {"pca_head0": "1", "pca_head1": "4"}
        if parts[1] == "conv":
            return f"{prefix}PCAEncoder.{head_conv[parts[0]]}.{conv_param(parts[2])}"
        return f"{prefix}PCAEncoder.{head_bn[parts[0]]}.{bn_param(parts[2])}"
    if parts[0].startswith("body_pe"):
        i = parts[0][len("body_pe"):]
        lin = {"linear0": "0", "linear1": "2"}[parts[1]]
        return f"body_positional_encoding{i}.{lin}.{conv_param(parts[2])}"
    if parts[0].startswith("garment_pe"):
        i = parts[0][len("garment_pe"):]
        lin = {"linear0": "0", "linear1": "2"}[parts[1]]
        return f"garment_positional_encoding{i}.{lin}.{conv_param(parts[2])}"
    if parts[0].startswith("temporal_qkv"):
        i = int(parts[0][len("temporal_qkv"):]) + 1
        return f"temporal_qkv_{i}.{conv_param(parts[1])}"
    if parts[0].startswith("gcn"):
        r, l = parts[0][3:].split("_")
        return f"lbs_graph_regress{int(r) + 1}.{l}.{parts[1]}"
    raise KeyError(path)


def torch_value_for(coll, path, flax_value):
    """Produce the torch-layout tensor whose import should equal flax_value."""
    leaf = path[-1]
    v = np.asarray(flax_value)
    if leaf == "kernel" and v.ndim == 2:
        # conv/linear weight: torch stores (out, in[, 1, 1])
        if "conv" in path:
            return np.ascontiguousarray(v.T)[..., None, None]
        return np.ascontiguousarray(v.T)
    return v


@pytest.fixture(scope="module")
def posed_setup():
    assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)
    body_model = smpl.synthetic_smpl(num_verts=200)
    model = PosedGarmentModel(
        assets=assets,
        body_faces=body_model.faces,
        lbs_k=4, iterations=3)
    batch = make_batch(assets, body_model, batch_size=1, T=2, npoints=1536)
    body = body_inputs_from_batch(batch)
    variables = model.init(jax.random.PRNGKey(0), batch["pcd"], body, train=False)
    return model, variables


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


class TestTorchImport:
    def test_full_roundtrip(self, posed_setup):
        model, variables = posed_setup
        rng = np.random.RandomState(0)

        state_dict = {}
        expected = {}
        for coll in ("params", "batch_stats"):
            for path, leaf in _flat(variables[coll]).items():
                tkey = flax_path_to_torch_key(coll, path)
                rand = rng.randn(*np.asarray(leaf).shape).astype(np.float32)
                expected[(coll,) + path] = rand
                state_dict[tkey] = torch_value_for(coll, path, rand)

        # every generated torch key must be understood by the importer
        for tkey in state_dict:
            assert map_torch_key(tkey) is not None, tkey

        new_vars, report = import_torch_checkpoint(state_dict, variables, strict=True)
        assert not report["skipped"], report["skipped"][:5]
        assert len(report["loaded"]) == len(state_dict)

        for coll in ("params", "batch_stats"):
            for path, leaf in _flat(new_vars[coll]).items():
                np.testing.assert_array_equal(
                    np.asarray(leaf), expected[(coll,) + path],
                    err_msg=str((coll,) + path))

    def test_module_prefix_and_tolerance(self, posed_setup):
        model, variables = posed_setup
        # DDP 'module.' prefix is stripped; junk keys are skipped non-strict
        k = "module.temporal_qkv_1.weight"
        target = np.asarray(_flat(variables["params"])[("temporal_qkv0", "kernel")])
        sd = {k: np.ones_like(target).T,
              "some.unknown.key": np.zeros((3,)),
              "module.temporal_qkv_2.weight": np.zeros((5, 5))}  # bad shape
        new_vars, report = import_torch_checkpoint(sd, variables, strict=False)
        got = np.asarray(_flat(new_vars["params"])[("temporal_qkv0", "kernel")])
        np.testing.assert_array_equal(got, np.ones_like(target))
        reasons = dict(report["skipped"])
        assert "some.unknown.key" in reasons
        assert "module.temporal_qkv_2.weight" in reasons

    def test_torch_save_load(self, tmp_path, posed_setup):
        torch = pytest.importorskip("torch")
        model, variables = posed_setup
        target = np.asarray(_flat(variables["params"])[("gcn0_0", "weight")])
        sd = {"lbs_graph_regress1.0.weight": torch.from_numpy(
            np.full_like(target, 2.5))}
        path = str(tmp_path / "ckpt.pth")
        torch.save({"epoch": 3, "model_state": sd, "optimizer_state": None,
                    "other_state": {"best_v_l2": 1.0}}, path)
        from garment4d_tpu.train.torch_import import load_torch_state_dict
        loaded = load_torch_state_dict(path)
        new_vars, report = import_torch_checkpoint(loaded, variables)
        got = np.asarray(_flat(new_vars["params"])[("gcn0_0", "weight")])
        np.testing.assert_array_equal(got, np.full_like(target, 2.5))


class TestNumpyZipLoader:
    """The numpy-only reader for torch's zipfile serialization format must
    reproduce torch.load exactly (it backs load_torch_state_dict on
    torch-free installs)."""

    def test_matches_torch_load(self, tmp_path):
        import torch

        from garment4d_tpu.train.torch_import import (
            _load_torch_zip_numpy,
            load_torch_state_dict,
        )

        rng = np.random.RandomState(3)
        state = {
            "model_state": {
                "a.conv.weight": torch.from_numpy(
                    rng.randn(8, 4, 1).astype(np.float32)),
                "a.bn.running_mean": torch.from_numpy(
                    rng.randn(8).astype(np.float64)),
                "steps": torch.tensor(7, dtype=torch.int64),
                # non-contiguous tensor: exercises the stride handling
                "b.weight": torch.from_numpy(
                    rng.randn(6, 10).astype(np.float32)).t(),
            },
            "epoch": 3,
        }
        path = str(tmp_path / "ck.ckpt")
        torch.save(state, path)

        got = _load_torch_zip_numpy(path)
        assert got["epoch"] == 3
        want = load_torch_state_dict(path)  # torch path (torch importable)
        gm = got["model_state"]
        assert set(gm) == set(want)
        for k in want:
            np.testing.assert_array_equal(np.asarray(gm[k]), want[k])

    def test_non_zip_raises(self, tmp_path):
        from garment4d_tpu.train.torch_import import _load_torch_zip_numpy

        p = tmp_path / "legacy.ckpt"
        p.write_bytes(b"not a zip at all")
        with pytest.raises(Exception):
            _load_torch_zip_numpy(str(p))
