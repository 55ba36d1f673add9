"""Torch checkpoint importer: reference .ckpt -> flax variables.

The parity target requires loading the reference's released torch
checkpoints (`pretrain/{skirt,trousers,tshirt}.ckpt`; format
`{epoch, model_state, optimizer_state, other_state}`, reference
`utils/train_utils.py:100-112`). This maps every torch `state_dict` key of
`PCAGarmentEncoderSeg` / `PCALBSGarmentUseSegEncoderSeg` (+ MGN variant) onto
our flax trees:

  * `module.` / stage prefixes stripped with the same prefix-tolerant
    matching as `find_match_key` (`train_utils.py:114-121`),
  * Conv1d/Conv2d 1x1 weights (out,in,1[,1]) -> Dense kernels (in,out),
  * Linear weights (out,in) -> kernels (in,out),
  * pygcn GraphConvolution weights (in,out) -> kept as-is,
  * BatchNorm weight/bias -> scale/bias params; running stats -> batch_stats.

Reading the pickle uses torch (CPU build available in the image) when
importable, with a numpy-only fallback for zipfile-format checkpoints.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt / .pth and return {key: ndarray} of model_state."""
    try:
        import torch
    except ImportError:
        ckpt = _load_torch_zip_numpy(path)
    else:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and ckpt.get("model_state") is not None:
        ckpt = ckpt["model_state"]
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


# torch storage-class name -> numpy dtype (zip-format numpy-only loader)
_TORCH_STORAGE_DTYPES = {
    "FloatStorage": np.float32, "DoubleStorage": np.float64,
    "HalfStorage": np.float16, "LongStorage": np.int64,
    "IntStorage": np.int32, "ShortStorage": np.int16,
    "CharStorage": np.int8, "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def _load_torch_zip_numpy(path: str):
    """Numpy-only reader for torch's zipfile serialization format (the
    default since torch 1.6, i.e. every released reference checkpoint).

    The archive holds `<name>/data.pkl` - a pickle whose tensors are
    persistent-id references `('storage', <StorageClass>, key, location,
    numel)` - plus one raw little-endian buffer per storage under
    `<name>/data/<key>`. A custom Unpickler resolves the references to
    numpy buffers and rebuilds tensors with as_strided, so no torch import
    is needed. Legacy (non-zip) checkpoints still require torch."""
    import pickle
    import zipfile

    zf = zipfile.ZipFile(path)
    try:
        pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
    except StopIteration:
        raise ValueError(
            f"{path!r} is not a torch zipfile checkpoint (no data.pkl); "
            "legacy-format files need torch installed")
    root = pkl_name[: -len("data.pkl")]

    class _StorageRef:
        def __init__(self, dtype, key):
            self.dtype = dtype
            self.key = key

        def read(self):
            return np.frombuffer(zf.read(f"{root}data/{self.key}"),
                                 dtype=self.dtype)

    def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad,
                           backward_hooks, *extra):
        flat = storage.read()
        if not size:
            return flat[offset].copy()
        itemsize = flat.dtype.itemsize
        return np.lib.stride_tricks.as_strided(
            flat[offset:], shape=tuple(size),
            strides=tuple(s * itemsize for s in stride)).copy()

    def _rebuild_parameter(data, requires_grad=True, hooks=None):
        return data

    class _StorageClass:
        def __init__(self, name):
            self.name = name

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name in (
                    "_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor_v2
            if module == "torch._utils" and name == "_rebuild_parameter":
                return _rebuild_parameter
            if module == "torch" and name in _TORCH_STORAGE_DTYPES:
                return _StorageClass(name)
            if module == "torch" and name == "Size":
                return tuple
            if (module, name) == ("collections", "OrderedDict"):
                import collections

                return collections.OrderedDict
            if module in ("numpy", "numpy.core.multiarray",
                          "numpy._core.multiarray"):
                import importlib

                return getattr(importlib.import_module(module), name)
            raise pickle.UnpicklingError(
                f"numpy-only torch loader: unsupported global "
                f"{module}.{name} (install torch for this checkpoint)")

        def persistent_load(self, pid):
            kind, storage_cls, key = pid[0], pid[1], pid[2]
            if kind != "storage":
                raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
            name = (storage_cls.name if isinstance(storage_cls, _StorageClass)
                    else getattr(storage_cls, "__name__", str(storage_cls)))
            return _StorageRef(np.dtype(_TORCH_STORAGE_DTYPES[name]), key)

    with zf.open(pkl_name) as f:
        return _Unpickler(f).load()


# ---------------------------------------------------------------------------
# key mapping
# ---------------------------------------------------------------------------

_SA_NAME = {"0": "sa1", "1": "sa2", "2": "sa3"}
_FP_NAME = {"0": "fp1", "1": "fp2", "2": "fp3"}
_GE_NAME = {"0": "garment_sa1", "1": "garment_sa2"}
_PCA_HEAD = {"0": "pca_head0", "1": "pca_head0", "3": "pca_head1",
             "4": "pca_head1", "6": "pca_head2"}
_PE_LINEAR = {"0": "linear0", "2": "linear1"}
_MGN_LINEAR = {"0": "linear0", "2": "linear1", "4": "linear2"}


def _bn_leaf(param: str) -> Tuple[str, str]:
    """torch BN param name -> (collection, flax leaf)."""
    return {
        "weight": ("params", "scale"),
        "bias": ("params", "bias"),
        "running_mean": ("batch_stats", "mean"),
        "running_var": ("batch_stats", "var"),
    }[param]


def map_torch_key(key: str):
    """Map one reference state_dict key to (collection, path_tuple, transform).

    transform in {'conv', 'linear', 'none'}: how to reshape the tensor.
    Returns None for keys with no flax counterpart (num_batches_tracked).
    """
    if key.endswith("num_batches_tracked"):
        return None
    parts = key.split(".")
    if parts[0] == "module":  # DDP prefix (train_utils.py:117)
        parts = parts[1:]

    prefix: Tuple[str, ...] = ()
    if parts[0] == "PCA_garment_encoder":
        prefix = ("canonical",)
        parts = parts[1:]

    # ---- canonical-stage modules -------------------------------------
    if parts[0] == "pointnet":
        sub = parts[1]
        if sub == "SA_modules":
            # pointnet.SA_modules.{k}.mlps.{s}.layer{i}.{conv|bn}...
            k, _, s, layer = parts[2], parts[3], parts[4], parts[5]
            base = prefix + ("pointnet", _SA_NAME[k], f"mlp{s}", layer)
            return _conv_or_bn(base, parts[6:])
        if sub == "Middle_modules":
            # a SINGLE PointnetSAModule, not a ModuleList (reference
            # `pointnet2encoder.py:81`), so its keys are
            # pointnet.Middle_modules.mlps.{s}.layer{i}.{conv|bn}...
            k_, _, s, layer = "0", parts[2], parts[3], parts[4]
            base = prefix + ("pointnet", "middle", f"mlp{s}", layer)
            return _conv_or_bn(base, parts[5:])
        if sub == "FP_modules":
            k, _, layer = parts[2], parts[3], parts[4]
            base = prefix + ("pointnet", _FP_NAME[k], "mlp", layer)
            return _conv_or_bn(base, parts[5:])
        if sub == "FC_layer":
            idx = parts[2]
            head = {"0": "head0", "2": "head1"}[idx]
            base = prefix + ("pointnet", head)
            return _conv_or_bn(base, parts[3:])
        raise KeyError(key)

    if parts[0] == "GarmentEncoder":
        k, _, s, layer = parts[1], parts[2], parts[3], parts[4]
        base = prefix + (_GE_NAME[k], f"mlp{s}", layer)
        return _conv_or_bn(base, parts[5:])

    if parts[0] == "GarmentSummarize":
        _, s, layer = parts[1], parts[2], parts[3]
        base = prefix + ("garment_summarize", f"mlp{s}", layer)
        return _conv_or_bn(base, parts[4:])

    if parts[0] == "PCAEncoder":
        idx, param = parts[1], parts[2]
        head = _PCA_HEAD[idx]
        if idx in ("0", "3", "6"):  # Conv1d
            return ("params", prefix + (head, "conv", _W(param)), "conv")
        coll, leaf = _bn_leaf(param)
        return (coll, prefix + (head, "bn", leaf), "none")

    # ---- posed-stage modules -----------------------------------------
    m = re.fullmatch(r"body_positional_encoding(\d)", parts[0])
    if m:
        return ("params",
                (f"body_pe{m.group(1)}", _PE_LINEAR[parts[1]], _W(parts[2])),
                "linear")
    m = re.fullmatch(r"garment_positional_encoding(\d)", parts[0])
    if m:
        return ("params",
                (f"garment_pe{m.group(1)}", _PE_LINEAR[parts[1]], _W(parts[2])),
                "linear")
    m = re.fullmatch(r"temporal_qkv_(\d)", parts[0])
    if m:
        return ("params",
                (f"temporal_qkv{int(m.group(1)) - 1}", _W(parts[1])),
                "linear")
    m = re.fullmatch(r"lbs_graph_regress(\d)", parts[0])
    if m:
        layer_idx, param = parts[1], parts[2]
        return ("params",
                (f"gcn{int(m.group(1)) - 1}_{layer_idx}", param),
                "none")  # pygcn weight is already (in, out)
    if parts[0] == "displacement_encoder":  # MGN variant
        return ("params",
                ("displacement", _MGN_LINEAR[parts[1]], _W(parts[2])),
                "linear")

    raise KeyError(f"unmapped torch key: {key}")


def _W(param: str) -> str:
    return {"weight": "kernel", "bias": "bias"}[param]


def _conv_or_bn(base: Tuple[str, ...], rest):
    if rest[0] == "conv":
        return ("params", base + ("conv", _W(rest[1])), "conv")
    if rest[0] == "bn":  # pt_utils name is bn.bn.<param>
        param = rest[-1]
        coll, leaf = _bn_leaf(param)
        return (coll, base + ("bn", leaf), "none")
    raise KeyError(f"unexpected tail {rest} under {base}")


def _transform(value: np.ndarray, how: str) -> np.ndarray:
    if how == "conv":  # (out, in, 1[, 1]) or (out, in) -> (in, out)
        v = value.reshape(value.shape[0], value.shape[1]) if value.ndim > 2 else value
        return np.ascontiguousarray(v.T) if v.ndim == 2 else v
    if how == "linear":
        return np.ascontiguousarray(value.T) if value.ndim == 2 else value
    return value


def import_torch_checkpoint(state_dict: Dict[str, np.ndarray], variables,
                            strict: bool = False):
    """Merge a reference state_dict into flax `variables`
    ({'params': ..., 'batch_stats': ...}); returns (new_variables, report).

    Non-strict mode mirrors the reference's tolerant loader
    (`load_pretrained_model`, `train_utils.py:123-153`): unmapped keys and
    shape mismatches are skipped and reported.
    """
    import jax

    flat = {("params",) + k: np.asarray(v)
            for k, v in _flatten(variables["params"]).items()}
    flat.update({("batch_stats",) + k: np.asarray(v)
                 for k, v in _flatten(variables.get("batch_stats", {})).items()})

    loaded, skipped = [], []
    for key, value in state_dict.items():
        try:
            mapped = map_torch_key(key)
        except KeyError:
            skipped.append((key, "unmapped"))
            if strict:
                raise
            continue
        if mapped is None:
            continue
        coll, path, how = mapped
        full = (coll,) + tuple(path)
        value = _transform(np.asarray(value), how)
        if full not in flat:
            skipped.append((key, f"no target {full}"))
            if strict:
                raise KeyError(f"{key}: no flax target {full}")
            continue
        if flat[full].shape != value.shape:
            skipped.append((key, f"shape {value.shape} vs {flat[full].shape}"))
            if strict:
                raise ValueError(f"{key}: shape mismatch")
            continue
        flat[full] = value.astype(flat[full].dtype)
        loaded.append(key)

    params = _unflatten({k[1:]: v for k, v in flat.items() if k[0] == "params"})
    stats = _unflatten({k[1:]: v for k, v in flat.items() if k[0] == "batch_stats"})
    new_vars = dict(variables)
    new_vars["params"] = jax.tree_util.tree_map(
        lambda _, new: new, variables["params"], params)
    if "batch_stats" in variables:
        new_vars["batch_stats"] = jax.tree_util.tree_map(
            lambda _, new: new, variables["batch_stats"], stats)
    return new_vars, {"loaded": loaded, "skipped": skipped}


def _flatten(tree, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[tuple, np.ndarray]):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree
