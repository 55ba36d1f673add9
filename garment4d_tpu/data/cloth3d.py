"""CLOTH3D sequence dataset - same on-disk format as the reference.

Parity with reference `utils/dataloader.py` (SeqPointSMPLDataset +
SeqPointSMPL_collate_fn, SURVEY.md 2.5), re-architected for TPU:

  * the host reads files and computes the (deterministic, seed(0)-per-call)
    sampling indices exactly like `random_sample_pcd`
    (`dataloader.py:26-48`);
  * the three per-frame SMPL forwards (posed / "T-pose" / zero-pose,
    `dataloader.py:186-214`) run *batched on device* in `finalize_batch`
    instead of per-item on CPU workers - the single biggest input-pipeline
    win;
  * point-cloud assembly (shuffle body verts, offset garment by root joint,
    subsample, concat, resample - `dataloader.py:215-232`) happens on device
    with precomputed gather indices.

On-disk layout (reference README.md:58-72):
  <root>/CLOTH3D/<seq>/<frame>/{smpl_param.pkl, garment_flist.txt, <G>.bin}
  <root>/CLOTH3D/<seq>/gender.pkl
  <root>/CLOTH3D_template/<seq>/<Garment>.obj
  <root>/<G>_reg/<seq>/{PCACoeff_SS.pkl, remesh_weights.pkl}
  <root>/list/*.txt
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu.data import native
from garment4d_tpu.data.obj_io import interpolate_barycentric, read_obj
from garment4d_tpu.models.assets import LABEL_DICT
from garment4d_tpu.smpl import SmplModel, batch_rodrigues


def sample_choice(num_in: int, n: int, retain_order: bool = False) -> np.ndarray:
    """The index-choice of reference `random_sample_pcd` (`dataloader.py:26-48`):
    np.random.seed(0) per call, so the choice is a pure function of
    (num_in, n, retain_order). A local RandomState(0) draws bit-identically
    to the reference's global `np.random.seed(0)` (same MT19937 seeding) and
    keeps `raw_item` thread-safe under the parallel loader."""
    r = np.random.RandomState(0)
    if n == num_in:
        choice = np.arange(num_in, dtype=np.int32)
    elif n < num_in:
        choice = r.choice(np.arange(num_in, dtype=np.int32), n, replace=False)
        if retain_order:
            choice = np.sort(choice)
    else:
        replace = n - num_in > num_in
        choice = np.concatenate([
            np.arange(num_in, dtype=np.int32),
            r.choice(np.arange(num_in, dtype=np.int32), n - num_in,
                     replace=replace)])
    if not retain_order:
        r.shuffle(choice)
    return choice


@functools.lru_cache(maxsize=1024)
def _cached_sample_choice(num_in: int, n: int,
                          retain_order: bool = False) -> np.ndarray:
    """`sample_choice` memoised: the reference reseeds the global RNG with 0
    on every call, so the draw is a PURE function of the sizes - caching it
    changes no value, only skips the MT19937 replay (~26% of raw_item time
    at production shapes). Returned arrays are marked read-only; callers use
    them as gather indices. 1024 entries x ~N int32 ~= 28 MB bound."""
    out = sample_choice(num_in, n, retain_order)
    out.setflags(write=False)
    return out


@functools.lru_cache(maxsize=1024)
def _cached_body_shuffle(num_verts: int, garment_count: int,
                         npoints: int) -> np.ndarray:
    """`_body_shuffle_choice` memoised (same argument: RandomState(0)-replay
    makes it a pure function of the sizes)."""
    out = _body_shuffle_choice(num_verts, garment_count, npoints)
    out.setflags(write=False)
    return out


def z_rotation_matrix(zrot: float) -> np.ndarray:
    c, s = np.cos(zrot), np.sin(zrot)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


@dataclasses.dataclass
class Cloth3dPaths:
    root: str
    cloth3d_folder: str = "CLOTH3D"
    garment_folder: str = "Skirt_reg"
    template_prefix: str = "CLOTH3D_template"

    @property
    def smpl_param_prefix(self) -> str:
        return os.path.join(self.root, self.cloth3d_folder)


class Cloth3dDataset:
    """Sequence-window dataset over the CLOTH3D directory tree."""

    def __init__(self, paths: Cloth3dPaths, file_list: str, garment_name: str,
                 T: int, npoints: int, pca_dim: int = 64, is_train: bool = True,
                 exclude_list: Optional[str] = None, body_verts: int = 6890,
                 rng: Optional[np.random.RandomState] = None):
        self.paths = paths
        self.garment_name = garment_name
        self.T = T
        self.npoints = npoints
        self.pca_dim = pca_dim
        self.body_verts = body_verts
        # bounded like the module-level lru_caches above: at real CLOTH3D
        # sizes an entry is ~0.3-0.5 MB (pca + remesh + raw template), so a
        # full epoch over thousands of sequences must evict, not grow
        self._seq_cache: "collections.OrderedDict[str, tuple]" = \
            collections.OrderedDict()
        self._seq_cache_max = 1024
        rng = rng or np.random.RandomState()

        with open(file_list) as f:
            model_list = f.read().splitlines()
        excluded = set()
        if exclude_list:
            with open(exclude_list) as f:
                excluded = {l.rstrip() for l in f.read().splitlines()}

        # group frames by sequence prefix (reference `dataloader.py:67-77`)
        seqs: List[List[str]] = []
        last_pref = None
        for n in model_list:
            pref = n.split("/")[0]
            if pref in excluded:
                continue
            if pref != last_pref:
                last_pref = pref
                seqs.append([])
            seqs[-1].append(n)

        # T-windows (reference `dataloader.py:78-99`): train = random start +
        # per-step random skip; eval = contiguous chunks padded with the last
        self.windows: List[List[str]] = []
        for seq in seqs:
            if len(seq) < T:
                continue
            sample_time = int(len(seq) / T) + 1
            max_skip = min(int(len(seq) / T), 5)
            for i in range(sample_time):
                if is_train:
                    skips = [rng.randint(1, max_skip + 1) for _ in range(T - 1)]
                    start = rng.randint(0, len(seq) - sum(skips))
                    win = [seq[start]]
                    acc = start
                    for s in skips:
                        acc += s
                        win.append(seq[acc])
                    self.windows.append(win)
                else:
                    # NOTE (parity quirk, kept deliberately): when len(seq)
                    # is an exact multiple of T, sample_time over-counts by
                    # one and the last eval window is T copies of the final
                    # frame (reference dataloader.py:82-99 does the same);
                    # those duplicated frames slightly bias eval means in
                    # BOTH implementations, so this is byte-faithful rather
                    # than fixed
                    win = seq[i * T: i * T + T]
                    if len(win) < T:
                        win = win + [seq[-1]] * (T - len(win))
                    self.windows.append(win)

    def __len__(self) -> int:
        return len(self.windows)

    def _seq_dir(self, frame: str) -> str:
        return os.path.join(self.paths.smpl_param_prefix, frame)

    def _sequence_static(self, seq_name: str):
        """Per-sequence data that never changes across windows (gender, PCA
        coefficients, remesh weights, the RAW pre-rotation template verts),
        read once and cached. The reference re-reads these on every item
        because its DataLoader worker processes cannot share state
        (`dataloader.py:147-171`); threads can, and the values are
        immutable. The per-item z-rotation still applies downstream."""
        hit = self._seq_cache.get(seq_name)
        if hit is not None:
            return hit
        seq_root = os.path.join(self.paths.smpl_param_prefix, seq_name)
        with open(os.path.join(seq_root, "gender.pkl"), "rb") as f:
            gender = pickle.load(f)
        if gender not in (0, 1):
            # the reference raises for unknown genders (dataloader.py:199-214);
            # silently treating e.g. 2 as female would corrupt every SMPL body
            raise NotImplementedError(
                f"{seq_name}: gender {gender!r} (expected 0=female, 1=male)")
        reg_dir = os.path.join(self.paths.root, self.paths.garment_folder,
                               seq_name)
        with open(os.path.join(reg_dir, "PCACoeff_SS.pkl"), "rb") as f:
            pca_coeff = np.asarray(pickle.load(f)[: self.pca_dim], np.float32)
        with open(os.path.join(reg_dir, "remesh_weights.pkl"), "rb") as f:
            remesh = pickle.load(f)
        remesh_ind = np.stack([r["ind"] for r in remesh])
        remesh_w = np.stack([r["w"] for r in remesh])
        # join() with root like every other path field; an ABSOLUTE
        # template_prefix (what existing callers pass) wins the join
        # unchanged, while the documented relative default now resolves
        # under <root> instead of silently CWD-relative
        template_file = os.path.join(self.paths.root,
                                     self.paths.template_prefix, seq_name,
                                     f"{self.garment_name}.obj")
        tmpl_v_raw, _ = native.parse_obj(template_file)
        for a in (pca_coeff, remesh_ind, remesh_w, tmpl_v_raw):
            a.setflags(write=False)
        entry = (gender, pca_coeff, remesh_ind, remesh_w, tmpl_v_raw)
        # dict assignment is atomic under the GIL; a compute-twice race
        # between loader threads is benign (identical values). Eviction is
        # approximate-LRU (insertion order): popping a key another thread
        # is reading is fine - the entry tuple stays alive via its local
        # reference.
        self._seq_cache[seq_name] = entry
        while len(self._seq_cache) > self._seq_cache_max:
            try:
                self._seq_cache.popitem(last=False)
            except KeyError:  # racing evictors
                break
        return entry

    def raw_item(self, index: int) -> Dict[str, np.ndarray]:
        """Host-side part of __getitem__: file reads + sampling indices.
        Returns numpy arrays; SMPL forwards and pcd assembly happen on device
        in `finalize_batch`."""
        win = self.windows[index]
        seq_name = win[0].split("/")[0]
        T, N = self.T, self.npoints
        gender, pca_coeff, remesh_ind, remesh_w, tmpl_v_raw = \
            self._sequence_static(seq_name)

        poses, shapes = [], []
        garment_pts, garment_labels, garment_choice = [], [], []
        named_garment, body_shuffles = [], []
        inv_zrot_mat = None
        for frame in win:
            fdir = self._seq_dir(frame)
            with open(os.path.join(fdir, "smpl_param.pkl"), "rb") as f:
                param = pickle.load(f)
            poses.append(param["pose"].astype(np.float32).reshape(72))
            shapes.append(param["shape"].astype(np.float32).reshape(10))
            inv_zrot_mat = z_rotation_matrix(param["zrot"])

            with open(os.path.join(fdir, "garment_flist.txt")) as f:
                gfiles = [l.rstrip() for l in f.readlines()]
            pts_list, lab_list, by_name = [], [], {}
            all_bufs = native.read_bin_batch(
                [os.path.join(fdir, gf) for gf in gfiles])
            for gf, pts in zip(gfiles, all_bufs):
                gname = os.path.basename(gf)[:-5]  # strip "N.bin" -> reference [:-5]
                pts_list.append(pts)
                lab_list.append(np.full(pts.shape[0], LABEL_DICT[gname], np.int32))
                by_name[gname] = pts
            all_pts = np.concatenate(pts_list, 0) @ inv_zrot_mat
            all_lab = np.concatenate(lab_list, 0)
            choice = _cached_sample_choice(all_pts.shape[0], N)
            garment_pts.append(all_pts[choice].astype(np.float32))
            garment_labels.append(all_lab[choice])
            garment_choice.append(_cached_sample_choice(N, N // 2))
            body_shuffles.append(
                _cached_body_shuffle(self.body_verts, all_pts.shape[0], N))

            named = by_name[self.garment_name] @ inv_zrot_mat
            named_garment.append(
                native.barycentric(named, remesh_ind, remesh_w))

        tmpl_v = tmpl_v_raw @ inv_zrot_mat
        tmpl_v = native.barycentric(tmpl_v, remesh_ind, remesh_w)

        # final pcd resample choice (pure function of the input sizes)
        final_choice = _cached_sample_choice(self.body_verts + N // 2, N)

        return dict(
            gender=np.int32(gender),
            pose=np.stack(poses),                     # (T, 72)
            beta=np.stack(shapes),                    # (T, 10)
            garment_pcd=np.stack(garment_pts),        # (T, N, 3) garment cloud
            garment_pcd_label=np.stack(garment_labels),  # (T, N)
            garment_subsample=np.stack(garment_choice),  # (T, N//2)
            garment=np.stack(named_garment),          # (T, Vg, 3) remeshed GT
            garment_template_vertices=tmpl_v,         # (Vg, 3)
            pca_coeff=pca_coeff,
            final_choice=final_choice,                # (N,)
            body_shuffle=np.stack(body_shuffles),     # (T, Vb)
        )

    def collate(self, items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _body_shuffle_choice(num_verts: int, garment_count: int,
                         npoints: int) -> np.ndarray:
    """The body-vertex shuffle of reference `dataloader.py:216-218`.

    It uses the *global* numpy RNG state left behind by the preceding
    `random_sample_pcd(garment_cloud, npoints)` call (which reseeded with 0
    and then drew a choice + shuffle), so exact parity requires replaying
    those draws for the same input sizes. The replay runs on a local
    RandomState(0) - bit-identical to the reference's global RNG (same
    MT19937 seeding) and thread-safe under the parallel loader."""
    r = np.random.RandomState(0)
    # replay random_sample_pcd(garment_count -> npoints)
    if npoints != garment_count:
        if npoints < garment_count:
            choice = r.choice(
                np.arange(garment_count, dtype=np.int32), npoints, replace=False)
        else:
            replace = npoints - garment_count > garment_count
            choice = np.concatenate([
                np.arange(garment_count, dtype=np.int32),
                r.choice(np.arange(garment_count, dtype=np.int32),
                         npoints - garment_count, replace=replace)])
    else:
        choice = np.arange(garment_count, dtype=np.int32)
    r.shuffle(choice)
    # now the local state matches the reference's at the body-shuffle site
    out = np.arange(num_verts, dtype=np.int32)
    r.shuffle(out)
    return out


_FINALIZE_KEYS = (
    "pose", "beta", "gender", "body_shuffle", "garment_pcd",
    "garment_subsample", "garment_pcd_label", "final_choice", "garment",
    "garment_template_vertices", "pca_coeff",
)


def finalize_batch(raw: Dict[str, np.ndarray],
                   body_models: Dict[str, SmplModel]) -> Dict[str, jax.Array]:
    """Device-side batch completion: 3 batched SMPL forwards + pcd assembly.

    raw: collated numpy dict from `Cloth3dDataset`; body_models: {'male','female'}.
    Returns the 16-key training batch (reference `dataloader.py:262-294`).
    One jitted program per batch shape: unjitted, the ~20 jnp ops here each
    paid a per-op dispatch (pathological through the axon relay - see
    CLAUDE.md) and the J_regressor/lbs_weights broadcasts materialised
    four (B, T, J, Vb) HBM buffers as standalone ops.
    """
    arrays = {k: jnp.asarray(raw[k]) for k in _FINALIZE_KEYS}
    return _finalize_jit(arrays, body_models["male"], body_models["female"])


@jax.jit
def _finalize_jit(raw: Dict[str, jax.Array], male: SmplModel,
                  female: SmplModel) -> Dict[str, jax.Array]:
    from garment4d_tpu.data.synthetic import smpl_triple_forward

    body_models = {"male": male, "female": female}
    B, T = raw["pose"].shape[:2]
    pose = raw["pose"]
    beta = raw["beta"]

    out_m = smpl_triple_forward(body_models["male"], pose, beta)
    out_f = smpl_triple_forward(body_models["female"], pose, beta)
    is_male = raw["gender"] == 1

    def pick(m, f):
        expand = (slice(None),) + (None,) * (m.ndim - 1)
        return jnp.where(is_male[expand], m, f)

    body = {k: pick(out_m[k], out_f[k]) for k in out_m}

    Vb = body["smpl_vertices"].shape[2]
    root = body["smpl_root_joints"]  # (B, T, 3)

    body_v = body["smpl_vertices"]  # (B, T, Vb, 3)
    # per-item shuffles/choices are identical (pure functions of the shapes)
    # but kept per-item for generality
    body_shuffle = raw["body_shuffle"]  # (B, T, Vb)
    shuffled_body = jnp.take_along_axis(
        body_v, body_shuffle[:, :, :, None], axis=2)
    # garment points: offset by per-frame root joint, subsample to N//2
    g_pcd = raw["garment_pcd"] + root[:, :, None, :]
    sub = raw["garment_subsample"]  # (B, T, N//2)
    g_sel = jnp.take_along_axis(g_pcd, sub[..., None], axis=2)
    g_lab = jnp.take_along_axis(raw["garment_pcd_label"], sub, axis=2)

    pcd_all = jnp.concatenate([shuffled_body, g_sel], axis=2)  # (B,T,Vb+N/2,3)
    lab_all = jnp.concatenate([
        jnp.ones((B, T, Vb), jnp.int32),
        g_lab.astype(jnp.int32)], axis=2)
    final = raw["final_choice"]  # (B, N)
    pcd = jnp.take_along_axis(pcd_all, final[:, None, :, None], axis=2)
    labels = jnp.take_along_axis(lab_all, final[:, None, :], axis=2) - 1  # -1 shift

    J = male.J_regressor.shape[0]
    jr_m = jnp.broadcast_to(male.J_regressor[None, None], (B, T, J, Vb))
    jr_f = jnp.broadcast_to(female.J_regressor[None, None], (B, T, J, Vb))
    lw_m = jnp.broadcast_to(male.lbs_weights[None, None], (B, T, Vb, J))
    lw_f = jnp.broadcast_to(female.lbs_weights[None, None], (B, T, Vb, J))

    return dict(
        pose=pose,
        beta=beta,
        pcd=pcd,
        pcd_label=labels,
        garment=raw["garment"],
        garment_template_vertices=raw["garment_template_vertices"],
        pca_coeff=raw["pca_coeff"],
        J_regressor=pick(jr_m, jr_f),
        lbs_weights=pick(lw_m, lw_f),
        **body,
    )
