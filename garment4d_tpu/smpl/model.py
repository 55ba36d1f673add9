"""SMPL body model: buffer container + loaders.

Replaces the vendored smplx library on the main path (reference
`smplx/smplx/body_models.py:49-478`): loads the SMPL_{GENDER}.pkl buffers
(handling chumpy arrays without importing chumpy), exposes a parameter-less
layer-style forward (pose as rotation matrices, like the reference's
`SMPLLayer` with `pose2rot=False`) and an axis-angle forward.

Also provides `synthetic_smpl` - a tiny random body model used by the test
suite and benchmarks so nothing depends on the (non-redistributable) SMPL
weights being present.
"""

from __future__ import annotations

import dataclasses
import io
import pickle
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu.smpl.lbs import lbs as _lbs

Array = jax.Array

# SMPL constants
NUM_JOINTS = 24
NUM_BETAS = 10
NUM_BODY_VERTS = 6890


@dataclasses.dataclass(frozen=True)
class SmplModel:
    """Immutable SMPL buffer container (a pytree of jnp arrays + static faces).

    Buffers mirror the reference's registered buffers
    (`body_models.py:214-250`): v_template (V,3), shapedirs (V,3,10),
    posedirs (P, V*3) with P=(J-1)*9, J_regressor (J,V), parents (J,) static,
    lbs_weights (V,J), faces (F,3) static int.
    """

    v_template: Array
    shapedirs: Array
    posedirs: Array
    J_regressor: Array
    lbs_weights: Array
    parents: np.ndarray  # static
    faces: np.ndarray  # static

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    def forward_rotmats(self, betas: Array, rot_mats: Array):
        """betas: (B, 10), rot_mats: (B, J, 3, 3) -> (vertices, joints)."""
        return _lbs(betas, rot_mats, self.v_template, self.shapedirs,
                    self.posedirs, self.J_regressor, self.parents,
                    self.lbs_weights, pose2rot=False)

    def forward_axis_angle(self, betas: Array, pose: Array):
        """betas: (B, 10), pose: (B, J*3) axis-angle -> (vertices, joints)."""
        return _lbs(betas, pose, self.v_template, self.shapedirs,
                    self.posedirs, self.J_regressor, self.parents,
                    self.lbs_weights, pose2rot=True)


class _HashableArray:
    """Hashable numpy wrapper so static pytree metadata (parents, faces) works
    with jit's treedef equality/hash checks."""

    __slots__ = ("array", "_hash")

    def __init__(self, array):
        self.array = np.asarray(array)
        self._hash = hash((self.array.shape, self.array.tobytes()))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (isinstance(other, _HashableArray)
                and self.array.shape == other.array.shape
                and bool((self.array == other.array).all()))


jax.tree_util.register_pytree_node(
    SmplModel,
    lambda m: ((m.v_template, m.shapedirs, m.posedirs, m.J_regressor,
                m.lbs_weights),
               (_HashableArray(m.parents), _HashableArray(m.faces))),
    lambda aux, leaves: SmplModel(*leaves, parents=aux[0].array,
                                  faces=aux[1].array),
)


class _ChumpyUnpickler(pickle.Unpickler):
    """Unpickle SMPL .pkl files without chumpy installed.

    The released SMPL pickles store chumpy `Ch` arrays; we map the class to a
    shim whose __setstate__ keeps only the ndarray payload.
    """

    class _ChShim:
        def __setstate__(self, state):
            self.__dict__.update(state)

        def __array__(self, dtype=None):
            for key in ("x", "a", "_data"):
                if key in self.__dict__:
                    return np.asarray(self.__dict__[key], dtype=dtype)
            raise ValueError("unrecognised chumpy payload")

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyUnpickler._ChShim
        if module == "scipy.sparse.csc" and name == "csc_matrix":
            import scipy.sparse

            return scipy.sparse.csc_matrix
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray(), dtype=np.float64)
    return np.asarray(x)


def load_smpl_pickle(path: str) -> SmplModel:
    """Load a released SMPL_{GENDER}.pkl (latin1 pickle, chumpy buffers).

    Mirrors the buffer extraction in the reference
    (`body_models.py:214-250`): posedirs (V,3,P) -> (P, V*3) transpose,
    kintree_table[0] -> parents with parents[0] = -1 clamped to 0 sentinel.
    """
    with open(path, "rb") as f:
        data = _ChumpyUnpickler(io.BytesIO(f.read()), encoding="latin1").load()
    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)[:, :, :NUM_BETAS]
    posedirs_raw = _to_np(data["posedirs"]).astype(np.float32)
    posedirs = posedirs_raw.reshape(-1, posedirs_raw.shape[-1]).T.copy()
    J_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    lbs_weights = _to_np(data["weights"]).astype(np.float32)
    parents = _to_np(data["kintree_table"])[0].astype(np.int64)
    parents[0] = 0  # root; never indexed (chain starts at 1)
    faces = _to_np(data["f"]).astype(np.int32)
    return SmplModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        faces=faces,
    )


def load_smpl_npz(path: str) -> SmplModel:
    """Load from an .npz with the same keys (test fixtures / converted models)."""
    data = dict(np.load(path))
    return SmplModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(data["shapedirs"], jnp.float32),
        posedirs=jnp.asarray(data["posedirs"], jnp.float32),
        J_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
        lbs_weights=jnp.asarray(data["lbs_weights"], jnp.float32),
        parents=np.asarray(data["parents"], np.int64),
        faces=np.asarray(data["faces"], np.int32),
    )


def load_smpl(path: str) -> SmplModel:
    if path.endswith(".npz"):
        return load_smpl_npz(path)
    return load_smpl_pickle(path)


def synthetic_smpl(num_verts: int = 400, seed: int = 0,
                   num_joints: int = NUM_JOINTS) -> SmplModel:
    """A small random-but-valid SMPL-shaped body model for tests/benchmarks.

    Geometry: vertices sampled on a capsule-ish blob, joints on a chain with
    the real SMPL parent tree (if num_joints == 24), softmax-local skinning
    weights, small random shape/pose blendshapes.
    """
    rng = np.random.RandomState(seed)
    # real SMPL parent tree
    smpl_parents = np.array(
        [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
         18, 19, 20, 21], np.int64)
    if num_joints == NUM_JOINTS:
        parents = smpl_parents
    else:
        parents = np.concatenate([[0], np.arange(num_joints - 1)]).astype(np.int64)

    v_template = rng.randn(num_verts, 3).astype(np.float32) * 0.3
    v_template[:, 1] = np.linspace(-1.0, 0.6, num_verts) + rng.randn(num_verts) * 0.05
    joint_pos = rng.randn(num_joints, 3).astype(np.float32) * 0.4

    # J_regressor: soft assignment of vertices near each joint, rows sum to 1
    d2 = np.sum((joint_pos[:, None, :] - v_template[None, :, :]) ** 2, axis=-1)
    J_regressor = np.exp(-d2 / 0.1)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)
    J_regressor = J_regressor.astype(np.float32)

    w = np.exp(-d2.T / 0.05)  # (V, J)
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    shapedirs = (rng.randn(num_verts, 3, NUM_BETAS) * 0.01).astype(np.float32)
    posedirs = (rng.randn((num_joints - 1) * 9, num_verts * 3) * 0.001).astype(np.float32)

    # random triangulation over vertex indices (topology only needs validity)
    faces = rng.randint(0, num_verts, size=(2 * num_verts, 3)).astype(np.int32)
    bad = (faces[:, 0] == faces[:, 1]) | (faces[:, 1] == faces[:, 2]) | (faces[:, 0] == faces[:, 2])
    faces = faces[~bad]

    return SmplModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        parents=parents,
        faces=faces,
    )
