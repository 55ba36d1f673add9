"""CPU-torch mirror of the reference canonical-stage network.

Constructs the reference's `PCAGarmentEncoderSeg` class-for-class in plain
torch (reference `modules/mesh_encoder.py:43-169`, `pointnet2encoder.py:18-144`,
`pointnet2_modules.py`, `pytorch_utils.py`) with the EXACT state_dict key
naming of the released checkpoints, using the numpy golden oracles
(`golden.py`) in place of the CUDA geometry kernels. Together with the
torch->flax importer this turns "the importer maps keys" into "the imported
network computes the same function" - the strongest checkpoint-parity
statement available without the released .ckpt files (test:
`test_reference_parity.py`).

Only used by the test-suite; everything runs eval-mode on CPU.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

LABEL_DICT = {"Body": 1, "Skirt": 2, "Dress": 3, "Jumpsuit": 4, "Top": 5,
              "Trousers": 6, "Tshirt": 7}
CLASS_NUM = 7


# ---------------------------------------------------------------------------
# geometry ops on CPU: vectorised float32 oracles with the CUDA kernels'
# semantics (same arithmetic form as garment4d_tpu.ops so fp tie-breaks
# agree; the slow sequential goldens in golden.py pin the semantics)
# ---------------------------------------------------------------------------


def _np(x: torch.Tensor) -> np.ndarray:
    return x.detach().cpu().numpy()


def furthest_point_sample(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """f32 running-min FPS, start at 0 (`src/sampling_gpu.cu`)."""
    pts = _np(xyz).astype(np.float32)
    B, N, _ = pts.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, np.float32)
        last = 0
        for j in range(1, npoint):
            d = pts[b] - pts[b, last]
            temp = np.minimum(temp, np.sum(d * d, axis=-1, dtype=np.float32))
            last = int(np.argmax(temp))
            out[b, j] = last
    return torch.from_numpy(out)


def ball_query(radius, nsample, xyz, new_xyz) -> torch.Tensor:
    """First-`nsample` in-radius indices, first-hit tail replication
    (`src/ball_query_gpu.cu:29-44`)."""
    pts = _np(xyz).astype(np.float32)
    cen = _np(new_xyz).astype(np.float32)
    B, N, _ = pts.shape
    M = cen.shape[1]
    r2 = np.float32(radius) ** 2
    out = np.zeros((B, M, nsample), np.int32)
    for b in range(B):
        d = cen[b][:, None, :] - pts[b][None, :, :]
        mask = np.sum(d * d, axis=-1, dtype=np.float32) < r2  # (M, N)
        for m in range(M):
            hits = np.nonzero(mask[m])[0]
            if hits.size:
                k = min(hits.size, nsample)
                out[b, m, :] = hits[0]
                out[b, m, :k] = hits[:k]
    return torch.from_numpy(out)


def grouping_operation(features: torch.Tensor, idx: torch.Tensor):
    """features: (B, C, N), idx: (B, M, S) -> (B, C, M, S)."""
    B, C, _ = features.shape
    _, M, S = idx.shape
    flat = idx.reshape(B, 1, M * S).expand(B, C, M * S).long()
    return torch.gather(features, 2, flat).reshape(B, C, M, S)


def gather_operation(features: torch.Tensor, idx: torch.Tensor):
    """features: (B, C, N), idx: (B, M) -> (B, C, M)."""
    B, C, _ = features.shape
    M = idx.shape[1]
    return torch.gather(features, 2, idx.reshape(B, 1, M).expand(B, C, M).long())


def three_nn(unknown: torch.Tensor, known: torch.Tensor):
    """Exact 3-NN, f32 diff-form distances, ties -> lower index
    (`src/interpolate_gpu.cu:30-51` + the sqrt of `pointnet2_utils.py:98`)."""
    u, k = _np(unknown).astype(np.float32), _np(known).astype(np.float32)
    B = u.shape[0]
    dist = np.zeros((B, u.shape[1], 3), np.float32)
    idx = np.zeros((B, u.shape[1], 3), np.int32)
    for b in range(B):
        d = u[b][:, None, :] - k[b][None, :, :]
        d2 = np.sum(d * d, axis=-1, dtype=np.float32)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :3]
        idx[b] = order
        dist[b] = np.take_along_axis(d2, order, axis=-1)
    return torch.from_numpy(np.sqrt(dist)), torch.from_numpy(idx)


def three_interpolate(features: torch.Tensor, idx: torch.Tensor,
                      weight: torch.Tensor) -> torch.Tensor:
    """features: (B, C, M), idx/weight: (B, N, 3) -> (B, C, N)."""
    gathered = grouping_operation(features, idx)  # (B, C, N, 3)
    return (gathered * weight.unsqueeze(1)).sum(-1)


# ---------------------------------------------------------------------------
# pt_utils-equivalent layers (same child names: conv / bn.bn / activation)
# ---------------------------------------------------------------------------


class _BNWrap2d(nn.Sequential):
    def __init__(self, c):
        super().__init__()
        self.add_module("bn", nn.BatchNorm2d(c))


class _BNWrap1d(nn.Sequential):
    def __init__(self, c):
        super().__init__()
        self.add_module("bn", nn.BatchNorm1d(c))


class Conv2dUnit(nn.Sequential):
    def __init__(self, cin, cout, bn=True, activation=True):
        super().__init__()
        self.add_module("conv", nn.Conv2d(cin, cout, 1, bias=not bn))
        if bn:
            self.add_module("bn", _BNWrap2d(cout))
        if activation:
            self.add_module("activation", nn.ReLU(inplace=True))


class Conv1dUnit(nn.Sequential):
    def __init__(self, cin, cout, bn=True, activation=True):
        super().__init__()
        self.add_module("conv", nn.Conv1d(cin, cout, 1, bias=not bn))
        if bn:
            self.add_module("bn", _BNWrap1d(cout))
        if activation:
            self.add_module("activation", nn.ReLU(inplace=True))


class SharedMLP(nn.Sequential):
    def __init__(self, widths, bn=True):
        super().__init__()
        for i in range(len(widths) - 1):
            self.add_module(f"layer{i}", Conv2dUnit(widths[i], widths[i + 1],
                                                    bn=bn))


# ---------------------------------------------------------------------------
# SA / FP modules
# ---------------------------------------------------------------------------


class SAModuleMSG(nn.Module):
    """MSG set abstraction; `mlps` widths get +3 on the input when use_xyz
    (reference `pointnet2_modules.py:88-89`); npoint=None -> group-all."""

    def __init__(self, npoint, radii, nsamples, mlps, use_xyz=True, bn=True):
        super().__init__()
        self.npoint, self.radii, self.nsamples = npoint, radii, nsamples
        self.use_xyz = use_xyz
        self.mlps = nn.ModuleList()
        for spec in mlps:
            spec = list(spec)
            if use_xyz:
                spec[0] += 3
            self.mlps.append(SharedMLP(spec, bn=bn))

    def forward(self, xyz, features=None, new_xyz=None):
        """xyz: (B, N, 3); features: (B, C, N) -> (new_xyz, (B, sumC, M))."""
        if new_xyz is None and self.npoint is not None:
            xyz_t = xyz.transpose(1, 2).contiguous()
            new_xyz = gather_operation(
                xyz_t, furthest_point_sample(xyz, self.npoint)
            ).transpose(1, 2).contiguous()
        outs = []
        for i, mlp in enumerate(self.mlps):
            if self.npoint is not None:
                idx = ball_query(self.radii[i], self.nsamples[i], xyz, new_xyz)
                grouped = grouping_operation(
                    xyz.transpose(1, 2).contiguous(), idx)  # (B, 3, M, S)
                grouped = grouped - new_xyz.transpose(1, 2).unsqueeze(-1)
                if features is not None:
                    gf = grouping_operation(features, idx)
                    grouped = (torch.cat([grouped, gf], dim=1)
                               if self.use_xyz else gf)
            else:  # GroupAll
                grouped = xyz.transpose(1, 2).unsqueeze(2)
                if features is not None:
                    gf = features.unsqueeze(2)
                    grouped = (torch.cat([grouped, gf], dim=1)
                               if self.use_xyz else gf)
            h = mlp(grouped)
            outs.append(torch.max(h, dim=3, keepdim=False)[0])
        return new_xyz, torch.cat(outs, dim=1)


class FPModule(nn.Module):
    def __init__(self, mlp, bn=True):
        super().__init__()
        self.mlp = SharedMLP(mlp, bn=bn)

    def forward(self, unknown, known, unknown_feats, known_feats):
        dist, idx = three_nn(unknown, known)
        recip = 1.0 / (dist + 1e-8)
        weight = recip / recip.sum(dim=2, keepdim=True)
        interp = three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            interp = torch.cat([interp, unknown_feats], dim=1)
        return self.mlp(interp.unsqueeze(-1)).squeeze(-1)


# ---------------------------------------------------------------------------
# backbone + canonical model
# ---------------------------------------------------------------------------


class Pointnet2MSGSEG(nn.Module):
    """Reference `pointnet2encoder.py:18-144` with global_feat=False (the
    canonical stage's configuration, `mesh_encoder.py:49`)."""

    def __init__(self):
        super().__init__()
        self.SA_modules = nn.ModuleList([
            SAModuleMSG(1024, [0.05, 0.1], [16, 32],
                        [[0, 16, 16, 32], [0, 32, 32, 64]]),
            SAModuleMSG(256, [0.1, 0.2], [16, 32],
                        [[96, 32, 32, 64], [96, 64, 64, 128]]),
            SAModuleMSG(64, [0.2, 0.4], [32, 64],
                        [[192, 64, 64, 128], [192, 128, 128, 256]]),
        ])
        self.FP_modules = nn.ModuleList([
            FPModule([128 + 0, 128, 64]),
            FPModule([256 + 96, 256, 128]),
            FPModule([384 + 192, 512, 256]),
        ])
        self.FC_layer = nn.Sequential(
            Conv1dUnit(64, 32, bn=True),
            nn.Dropout(),
            Conv1dUnit(32, CLASS_NUM, bn=False, activation=False),
        )

    def forward(self, pc):
        xyz = pc[..., :3].contiguous()
        features = (pc[..., 3:].transpose(1, 2).contiguous()
                    if pc.size(-1) > 3 else None)
        l_xyz, l_features = [xyz], [features]
        for sa in self.SA_modules:
            li_xyz, li_f = sa(l_xyz[-1], l_features[-1])
            l_xyz.append(li_xyz)
            l_features.append(li_f)
        for i in range(-1, -(len(self.FP_modules) + 1), -1):
            l_features[i - 1] = self.FP_modules[i](
                l_xyz[i - 1], l_xyz[i], l_features[i - 1], l_features[i])
        sem_logits = self.FC_layer(l_features[0]).transpose(1, 2).contiguous()
        return None, sem_logits, l_features, l_xyz


class QueryAndGroup(nn.Module):
    """Reference `pointnet2_utils.py:232-265` (use_xyz=True): ball query,
    gather, center-subtract on xyz, concat features."""

    def __init__(self, radius, nsample):
        super().__init__()
        self.radius, self.nsample = radius, nsample

    def forward(self, xyz, new_xyz, features):
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = grouping_operation(
            xyz.transpose(1, 2).contiguous(), idx)  # (B, 3, M, S)
        grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
        grouped_features = grouping_operation(features, idx)
        return torch.cat([grouped_xyz, grouped_features], dim=1)


class PCAGarmentEncoderSeg(nn.Module):
    """Reference `mesh_encoder.py:43-169` (canonical stage)."""

    def __init__(self, garment_name, pca_components, pca_mean, pca_scale):
        super().__init__()
        self.garment_label = LABEL_DICT[garment_name] - 1
        self.pointnet = Pointnet2MSGSEG()
        self.GarmentEncoder = nn.ModuleList([
            SAModuleMSG(512, [0.05, 0.1], [16, 32],
                        [[64, 32, 32], [64, 64, 64]]),
            SAModuleMSG(64, [0.2, 0.4], [32, 64],
                        [[96, 128, 128], [96, 256, 256]]),
        ])
        self.GarmentSummarize = SAModuleMSG(
            None, [None], [None], [[384, 512, 512]])
        pca_dim = pca_components.shape[0]
        self.pca_dim = pca_dim
        self.PCAEncoder = nn.Sequential(
            nn.Conv1d(512, 128, 1), nn.BatchNorm1d(128), nn.ReLU(),
            nn.Conv1d(128, 64, 1), nn.BatchNorm1d(64), nn.ReLU(),
            nn.Conv1d(64, pca_dim, 1),
        )
        self.PCA_comp = torch.from_numpy(np.asarray(pca_components, np.float32))
        self.PCA_mean = torch.from_numpy(np.asarray(pca_mean, np.float32))
        self.PCA_scale = torch.from_numpy(np.asarray(pca_scale, np.float32))

    def calc_segmentation_results(self, x, sem_logits, n, feature):
        """First-n garment-class points, zero-padded
        (reference `mesh_encoder.py:109-125`)."""
        BT = x.shape[0]
        feature = feature.transpose(1, 2)  # (BT, N, C)
        labels = torch.argmax(sem_logits, dim=2).detach()
        vs, fs = [], []
        for i in range(BT):
            sel = labels[i] == self.garment_label
            cur_x, cur_f = x[i][sel], feature[i][sel]
            pad = max(0, n - cur_x.shape[0])
            vs.append(torch.cat([cur_x[:n], cur_x.new_zeros(pad, 3)]))
            fs.append(torch.cat([cur_f[:n], cur_f.new_zeros(pad, cur_f.shape[1])]))
        return torch.stack(vs), torch.stack(fs)

    def forward(self, x):
        """x: (B, T, N, 3) -> dict with sem_logits, PCA coeff, tpose garment."""
        B, T, N, _ = x.shape
        x = x.reshape(B * T, N, -1)
        _, sem_logits, feature_list, xyz_list = self.pointnet(x)
        garment_v, garment_f = self.calc_segmentation_results(
            xyz_list[0], sem_logits, N // 4, feature_list[0])
        garment_f = garment_f.transpose(1, 2).contiguous()
        l_xyz, l_features = [garment_v], [garment_f]
        for enc in self.GarmentEncoder:
            li_xyz, li_f = enc(l_xyz[-1], l_features[-1])
            l_xyz.append(li_xyz)
            l_features.append(li_f)
        summary = self.GarmentSummarize(l_xyz[-1], l_features[-1])[1]
        summary = summary.reshape(B, T, 512)
        coeff = self.PCAEncoder(
            summary.max(1)[0].reshape(B, -1, 1)).reshape(B, self.pca_dim)
        tpose = ((coeff @ self.PCA_comp + self.PCA_mean)
                 * self.PCA_scale).reshape(B, -1, 3)
        return {"sem_logits": sem_logits, "garment_summary": summary,
                "garment_PCA_coeff": coeff, "tpose_garment": tpose,
                "garment_v": garment_v,
                # per-level garment-encoder outputs, consumed by the posed
                # stage's garment queries (reference mesh_encoder.py:157-158)
                "garment_v_list": l_xyz, "garment_f_list": l_features}


# ---------------------------------------------------------------------------
# posed-stage mirror (reference `mesh_encoder.py:172-487` + MGN variant
# `:489-614`): LBS interpolation, PE blocks, temporal attention, pygcn
# refinement, with the EXACT state_dict key naming of the released ckpts.
# ---------------------------------------------------------------------------

import scipy.sparse as sp


def batch_rodrigues_t(rot_vecs: torch.Tensor) -> torch.Tensor:
    """Axis-angle -> rotation matrices (reference `smplx/smplx/lbs.py:312`,
    incl. the +1e-8 inside the norm)."""
    n = rot_vecs.shape[0]
    angle = torch.norm(rot_vecs + 1e-8, dim=1, keepdim=True)
    rot_dir = rot_vecs / angle
    cos = torch.cos(angle)[:, None, :]
    sin = torch.sin(angle)[:, None, :]
    rx, ry, rz = torch.split(rot_dir, 1, dim=1)
    zeros = torch.zeros((n, 1), dtype=rot_vecs.dtype)
    K = torch.cat([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros],
                  dim=1).view(n, 3, 3)
    ident = torch.eye(3, dtype=rot_vecs.dtype)[None]
    return ident + sin * K + (1 - cos) * torch.bmm(K, K)


def vertices2jointsB_t(J_regressor_B: torch.Tensor,
                       vertices: torch.Tensor) -> torch.Tensor:
    """(B, J, V) x (B, V, 3) -> (B, J, 3) (`lbs.py:270-286`)."""
    return torch.einsum("bik,bji->bjk", vertices, J_regressor_B)


def batch_rigid_transform_t(rot_mats, joints, parents):
    """Kinematic-chain rigid transforms (`lbs.py:362-421`): returns
    (posed_joints, rel_transforms (B, J, 4, 4))."""
    B, J = joints.shape[:2]
    rel = joints.clone()
    rel[:, 1:] = rel[:, 1:] - joints[:, parents[1:]]
    tm = torch.cat([
        torch.nn.functional.pad(rot_mats.reshape(-1, 3, 3), [0, 0, 0, 1]),
        torch.nn.functional.pad(rel.reshape(-1, 3, 1), [0, 0, 0, 1], value=1),
    ], dim=2).reshape(B, J, 4, 4)
    chain = [tm[:, 0]]
    for i in range(1, J):
        chain.append(torch.matmul(chain[parents[i]], tm[:, i]))
    transforms = torch.stack(chain, dim=1)
    posed_joints = transforms[:, :, :3, 3]
    jh = torch.nn.functional.pad(joints[..., None], [0, 0, 0, 1])
    rel_tf = transforms - torch.nn.functional.pad(
        torch.matmul(transforms, jh), [3, 0])
    return posed_joints, rel_tf


def knn_points_t(query: torch.Tensor, ref: torch.Tensor, K: int = 1):
    """chamferdist `knn_points` semantics: per-query K nearest reference
    points, SQUARED f32 diff-form distances, ascending, ties -> lower index.
    Returns (dists (B, M, K), idx (B, M, K))."""
    q, r = _np(query).astype(np.float32), _np(ref).astype(np.float32)
    B, M = q.shape[:2]
    dists = np.zeros((B, M, K), np.float32)
    idx = np.zeros((B, M, K), np.int64)
    for b in range(B):
        d = q[b][:, None, :] - r[b][None, :, :]
        d2 = np.sum(d * d, axis=-1, dtype=np.float32)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :K]
        idx[b] = order
        dists[b] = np.take_along_axis(d2, order, axis=-1)
    return torch.from_numpy(dists), torch.from_numpy(idx)


def compute_vnorms_t(verts: torch.Tensor, faces_tri: np.ndarray):
    """Reference `mesh_utils.compute_vnorms`: normalised face normals
    scattered to their (openmesh-incidence) vertices, then normalised.
    verts (B, V, 3), faces_tri (F, 3) -> (B, V, 3)."""
    f = torch.from_numpy(faces_tri.astype(np.int64))
    v0, v1, v2 = verts[:, f[:, 0]], verts[:, f[:, 1]], verts[:, f[:, 2]]
    fn = torch.cross(v1 - v0, v2 - v0, dim=-1)
    fn = fn / torch.clamp(fn.norm(dim=-1, keepdim=True), min=1e-6)
    vn = torch.zeros_like(verts)
    for k in range(3):
        vn.index_add_(1, f[:, k], fn)
    return vn / torch.clamp(vn.norm(dim=-1, keepdim=True), min=1e-6)


class GraphConvolution(nn.Module):
    """Reference `modules/pygcn/layers.py:9-60`: weight stored (in, out) —
    NOT the nn.Linear (out, in) convention — output = adj @ (x @ W) + b."""

    def __init__(self, in_features, out_features):
        super().__init__()
        self.weight = nn.Parameter(torch.empty(in_features, out_features))
        self.bias = nn.Parameter(torch.empty(out_features))
        stdv = 1.0 / np.sqrt(out_features)
        with torch.no_grad():
            self.weight.uniform_(-stdv, stdv)
            self.bias.uniform_(-stdv, stdv)

    def forward(self, x, adj):
        # (BT, V, C) batched form of the reference's spmm reshuffle
        return torch.einsum("vw,bwc->bvc", adj, x @ self.weight) + self.bias


def _reference_adjacency(faces) -> sp.coo_matrix:
    """The reference's edge-buffer adjacency (`mesh_encoder.py:288-305`)
    including its quirks: 4 zero-initialised slots per face (a triangle
    leaves slot i*4+2 as a spurious (0,0) entry), duplicate directed edges
    SUM, symmetrisation is the add/multiply dance (== elementwise max)."""
    faces = [list(f) for f in faces]
    nv = max(max(f) for f in faces) + 1
    edges = np.zeros([2, len(faces) * 4], dtype=np.int32)
    for i, f in enumerate(faces):
        if len(f) == 4:
            sl = [(f[0], f[1]), (f[1], f[2]), (f[2], f[3]), (f[3], f[0])]
            for j, e in enumerate(sl):
                edges[:, i * 4 + j] = e
        elif len(f) == 3:
            edges[:, i * 4 + 0] = (f[0], f[1])
            edges[:, i * 4 + 1] = (f[1], f[2])
            edges[:, i * 4 + 3] = (f[2], f[0])
        else:
            raise NotImplementedError
    adj = sp.coo_matrix((np.ones(edges.shape[1]), (edges[0], edges[1])),
                        shape=(nv, nv), dtype=np.float32)
    adj = adj + adj.T.multiply(adj.T > adj) - adj.multiply(adj.T > adj)
    return adj


def _row_normalize_sp(mx):
    """pygcn `utils.normalize` (row-normalise, inf -> 0)."""
    rowsum = np.array(mx.sum(1))
    r_inv = np.power(rowsum, -1.0).flatten()
    r_inv[np.isinf(r_inv)] = 0.0
    return sp.diags(r_inv).dot(mx)


class PCALBSGarmentUseSegEncoderSeg(nn.Module):
    """Reference `mesh_encoder.py:172-487` (posed stage). Same child names as
    the released checkpoints' state_dict; geometry ops via the CPU oracles."""

    ITER = 3
    feat_num = 32
    hidden_dim = 128

    def __init__(self, garment_name, pca_components, pca_mean, pca_scale,
                 garment_faces, body_faces_tri, parents, lbs_k=8):
        super().__init__()
        self.PCA_garment_encoder = PCAGarmentEncoderSeg(
            garment_name, pca_components, pca_mean, pca_scale)
        self.lbs_k = lbs_k
        self.parents = np.asarray(parents, np.int64)
        self.body_faces_tri = np.asarray(body_faces_tri, np.int32)

        self.garment_radius_list = [0.1, 0.2, 0.4]
        self.garment_sample_num_list = [32, 16, 8]
        self.body_radius_list = [0.1, 0.2, 0.4]
        self.body_sample_num_list = [8, 16, 32]
        if garment_name == "Trousers":
            self.garment_sample_num_list = [32, 8, 4]

        for i in range(3):
            self.add_module(f"body_query_group{i}", QueryAndGroup(
                self.body_radius_list[i], self.body_sample_num_list[i]))
            self.add_module(f"body_positional_encoding{i}", nn.Sequential(
                nn.Linear(6, self.feat_num), nn.ReLU(),
                nn.Linear(self.feat_num, self.feat_num)))
            self.add_module(f"garment_query_group{i}", QueryAndGroup(
                self.garment_radius_list[i], self.garment_sample_num_list[i]))
        self.garment_positional_encoding_input_dim = [3 + 64, 3 + 32 + 64,
                                                      3 + 128 + 256]
        for i in range(3):
            self.add_module(f"garment_positional_encoding{i}", nn.Sequential(
                nn.Linear(self.garment_positional_encoding_input_dim[i],
                          self.feat_num),
                nn.ReLU(), nn.Linear(self.feat_num, self.feat_num)))
        self.temporal_qkv_1 = nn.Linear(self.hidden_dim, self.hidden_dim * 3,
                                        bias=False)
        self.temporal_qkv_2 = nn.Linear(self.hidden_dim, self.hidden_dim * 3,
                                        bias=False)

        start = self.feat_num * 6 + 3
        self.lbs_graph_regress1 = nn.ModuleList([
            GraphConvolution(start, self.hidden_dim),
            GraphConvolution(self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, 3)])
        self.lbs_graph_regress2 = nn.ModuleList([
            GraphConvolution(start + self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, 3)])
        self.lbs_graph_regress3 = nn.ModuleList([
            GraphConvolution(start + self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, self.hidden_dim),
            GraphConvolution(self.hidden_dim, 3)])

        self.adj_old = _reference_adjacency(garment_faces)
        adj = _row_normalize_sp(self.adj_old + sp.eye(self.adj_old.shape[0]))
        self.adj_dense = torch.from_numpy(
            np.asarray(adj.todense(), np.float32))

    # ---- reference `mesh_encoder.py:312-410` ---------------------------
    def lbs_garment_interpolation(self, pred_template_garment_v,
                                  tpose_vertices, tpose_root_joints,
                                  zeropose_vertices, gt_pose, T_J_regressor,
                                  T_lbs_weights, K):
        B, Vg = pred_template_garment_v.shape[:2]
        T = gt_pose.shape[1]
        J = T_J_regressor.shape[2]
        BT = B * T
        gt_pose_mat = batch_rodrigues_t(
            gt_pose.reshape(-1, 3)).reshape(BT, 24, 3, 3)

        root_g = pred_template_garment_v + tpose_root_joints.reshape(
            B, 1, 3)
        nnk_d, nnk_i = knn_points_t(root_g, tpose_vertices, K=K)
        K64 = min(64, K)
        nn64_d, nn64_i = knn_points_t(root_g, tpose_vertices, K=K64)

        inv_pose = torch.zeros(B, 24, 3)
        inv_pose[:, 0, 0] = -np.pi / 2
        inv_pose[:, 1, 1] = 0.15
        inv_pose[:, 2, 1] = -0.15
        inv_pose_mat = batch_rodrigues_t(
            inv_pose.reshape(-1, 3)).reshape(B, 24, 3, 3)
        inv_J = vertices2jointsB_t(T_J_regressor[:, 0], tpose_vertices)
        _, inv_A = batch_rigid_transform_t(inv_pose_mat, inv_J, self.parents)

        inv_W = T_lbs_weights[:, 0].reshape(B, -1, 1, J).repeat(1, 1, K64, 1)
        inv_nn_W = torch.gather(
            inv_W, 1, nn64_i.reshape(B, -1, K64, 1).repeat(1, 1, 1, J))
        iw64 = 1.0 / nn64_d.reshape(B, -1, K64, 1)
        iw64[torch.isinf(iw64)] = 0
        iw64 = iw64 / iw64.sum(-2, keepdim=True)
        iw64[torch.isinf(iw64)] = 0
        inv_nn_W = (inv_nn_W * iw64).sum(-2)
        inv_nn_T = torch.matmul(
            inv_nn_W, inv_A.reshape(B, J, 16)).view(B, -1, 4, 4)

        hom = torch.ones(B, Vg, 1)
        inv_v = torch.matmul(inv_nn_T, torch.cat([root_g, hom], 2)[..., None])
        inv_template = inv_v[:, :, :3, 0].reshape(B, 1, Vg, 3).repeat(
            1, T, 1, 1).reshape(BT, Vg, 3)

        zero_v = zeropose_vertices.reshape(BT, -1, 3)
        Jp = vertices2jointsB_t(T_J_regressor.reshape(BT, J, -1), zero_v)
        _, A = batch_rigid_transform_t(gt_pose_mat, Jp, self.parents)

        iw = 1.0 / nnk_d.reshape(B, -1, K, 1)
        iw[torch.isinf(iw)] = 0
        iw = iw / iw.sum(-2, keepdim=True)
        iw[torch.isinf(iw)] = 0
        W = T_lbs_weights.reshape(BT, -1, 1, J).repeat(1, 1, K, 1)
        nn_W = torch.gather(
            W, 1, nnk_i.reshape(B, 1, -1, K, 1).repeat(
                1, T, 1, 1, J).reshape(BT, -1, K, J))
        nn_W = (nn_W * iw.reshape(B, 1, -1, K, 1).repeat(
            1, T, 1, 1, 1).reshape(BT, -1, K, 1)).sum(-2)

        if K > 1:
            # the literal 100-iteration sparse smoothing loop
            # (`mesh_encoder.py:384-391`), dense here
            adj_s = _row_normalize_sp(self.adj_old) - sp.eye(
                self.adj_old.shape[0])
            adj_s = torch.from_numpy(np.asarray(adj_s.todense(), np.float32))
            for _ in range(100):
                nn_W = nn_W + 0.1 * torch.einsum("vw,bwj->bvj", adj_s, nn_W)

        nn_T = torch.matmul(nn_W, A.reshape(BT, J, 16)).view(BT, -1, 4, 4)
        homT = torch.ones(BT, Vg, 1)
        v = torch.matmul(nn_T, torch.cat([inv_template, homT], 2)[..., None])
        return (v[:, :, :3, 0].reshape(B, T, Vg, 3),
                inv_template.reshape(B, T, Vg, 3))

    def forward(self, x, batch):
        B, T, N, _ = x.shape
        with torch.no_grad():
            out = self.PCA_garment_encoder(x)
        garment_v_list = out["garment_v_list"]
        garment_f_list = out["garment_f_list"]

        body_v = batch["smpl_vertices"].reshape(B * T, -1, 3)
        body_vn = compute_vnorms_t(body_v, self.body_faces_tri)

        regressed = out["tpose_garment"].reshape(B, -1, 3)
        lbs_pred, lbs_stage1 = self.lbs_garment_interpolation(
            regressed, batch["tpose_smpl_vertices"],
            batch["tpose_smpl_root_joints"],
            batch["zeropose_smpl_vertices"], batch["pose"],
            batch["J_regressor"], batch["lbs_weights"], K=self.lbs_k)
        out["lbs_pred_garment_v"] = lbs_pred
        out["lbs_stage1_pred_garment_v"] = lbs_stage1

        cur = lbs_pred.reshape(B * T, -1, 3).contiguous()
        Vg = cur.shape[1]
        qkv_list = [self.temporal_qkv_1, self.temporal_qkv_2]
        regress = [self.lbs_graph_regress1, self.lbs_graph_regress2,
                   self.lbs_graph_regress3]
        iter_out, lbs_iter_feat = [], []
        for it in range(self.ITER):
            pe_feats = [cur]
            for i in range(3):
                qg = getattr(self, f"body_query_group{i}")(
                    body_v, cur, body_vn.transpose(1, 2).contiguous())
                qg = qg.permute(0, 2, 3, 1)  # (BT, Vg, S, 6)
                pe = getattr(self, f"body_positional_encoding{i}")(
                    qg).max(-2)[0]
                pe_feats.append(pe)
            for i in range(3):
                qg = getattr(self, f"garment_query_group{i}")(
                    garment_v_list[i], cur, garment_f_list[i])
                qg = qg.permute(0, 2, 3, 1)
                pe = getattr(self, f"garment_positional_encoding{i}")(
                    qg).max(-2)[0]
                pe_feats.append(pe)
            feat = torch.cat(pe_feats, dim=2)
            if it > 0:
                last = lbs_iter_feat[-2].reshape(B, T, Vg, self.hidden_dim)
                q, k, v = qkv_list[it - 1](last).chunk(3, dim=-1)
                q = q.reshape(B, T, Vg * self.hidden_dim)
                k = k.reshape(B, T, Vg * self.hidden_dim)
                v = v.reshape(B, T, Vg * self.hidden_dim)
                qk = torch.softmax(
                    torch.matmul(q, k.transpose(1, 2)) / np.sqrt(T), dim=-1)
                mixed = torch.matmul(qk, v).reshape(
                    B * T, Vg, self.hidden_dim)
                feat = torch.cat([feat, mixed], dim=-1)
            for i, m in enumerate(regress[it]):
                feat = m(feat, self.adj_dense)
                if i != len(regress[it]) - 1:
                    feat = torch.relu(feat)
                lbs_iter_feat.append(feat)
            cur = cur + feat
            iter_out.append(cur.reshape(B, T, Vg, 3))
        out["iter_regressed_lbs_garment_v"] = iter_out
        return out


class PCALBSGarmentUseSegEncoderSegMGN(nn.Module):
    """Reference `mesh_encoder.py:489-614` (MGN baseline): per-frame
    displacement MLP on the garment summary, K=1 un-pose/re-pose LBS."""

    def __init__(self, garment_name, pca_components, pca_mean, pca_scale,
                 garment_faces, parents):
        super().__init__()
        self.PCA_garment_encoder = PCAGarmentEncoderSeg(
            garment_name, pca_components, pca_mean, pca_scale)
        self.parents = np.asarray(parents, np.int64)
        self.adj_old = _reference_adjacency(garment_faces)
        vnum = self.adj_old.shape[0]
        self.displacement_encoder = nn.Sequential(
            nn.Linear(512, 1024), nn.ReLU(),
            nn.Linear(1024, 2048), nn.ReLU(),
            nn.Linear(2048, vnum * 3))

    def lbs_garment_MGN(self, pred_v, tpose_vertices, tpose_root_joints,
                        zeropose_vertices, gt_pose, T_J_regressor,
                        T_lbs_weights):
        B, T, Vg = pred_v.shape[:3]
        J = T_J_regressor.shape[2]
        BT = B * T
        gt_pose_mat = batch_rodrigues_t(
            gt_pose.reshape(-1, 3)).reshape(BT, 24, 3, 3)
        root_g = (pred_v + tpose_root_joints.reshape(B, 1, 1, 3)
                  ).reshape(BT, Vg, 3)
        tpose_bt = tpose_vertices.reshape(B, 1, -1, 3).repeat(
            1, T, 1, 1).reshape(BT, -1, 3)
        _, nn_i = knn_points_t(root_g, tpose_bt, K=1)

        inv_pose = torch.zeros(BT, 24, 3)
        inv_pose[:, 0, 0] = -np.pi / 2
        inv_pose[:, 1, 1] = 0.15
        inv_pose[:, 2, 1] = -0.15
        inv_pose_mat = batch_rodrigues_t(
            inv_pose.reshape(-1, 3)).reshape(BT, 24, 3, 3)
        inv_J = vertices2jointsB_t(
            T_J_regressor.reshape(BT, J, -1), tpose_bt)
        _, inv_A = batch_rigid_transform_t(inv_pose_mat, inv_J, self.parents)

        W = T_lbs_weights.reshape(BT, -1, J)
        inv_T = torch.matmul(W, inv_A.reshape(BT, J, 16)).view(BT, -1, 4, 4)
        inv_nn_T = torch.gather(
            inv_T, 1, nn_i.reshape(BT, -1, 1, 1).repeat(1, 1, 4, 4))
        hom = torch.ones(BT, Vg, 1)
        inv_v = torch.matmul(inv_nn_T, torch.cat([root_g, hom], 2)[..., None])
        inv_template = inv_v[:, :, :3, 0].reshape(BT, Vg, 3)

        zero_v = zeropose_vertices.reshape(BT, -1, 3)
        Jp = vertices2jointsB_t(T_J_regressor.reshape(BT, J, -1), zero_v)
        _, A = batch_rigid_transform_t(gt_pose_mat, Jp, self.parents)
        Tm = torch.matmul(W, A.reshape(BT, J, 16)).view(BT, -1, 4, 4)
        nn_T = torch.gather(
            Tm, 1, nn_i.reshape(BT, -1, 1, 1).repeat(1, 1, 4, 4))
        v = torch.matmul(nn_T, torch.cat([inv_template, hom], 2)[..., None])
        return (v[:, :, :3, 0].reshape(B, T, Vg, 3),
                inv_template.reshape(B, T, Vg, 3))

    def forward(self, x, batch):
        B, T, N, _ = x.shape
        with torch.no_grad():
            out = self.PCA_garment_encoder(x)
        regressed = out["tpose_garment"].reshape(B, -1, 3)
        Vg = regressed.shape[1]
        disp = self.displacement_encoder(
            out["garment_summary"]).reshape(B, T, Vg, 3) * 0.05
        disp[torch.isnan(disp)] = 0
        pred = regressed.reshape(B, 1, Vg, 3).repeat(1, T, 1, 1) + disp
        lbs_pred, lbs_stage1 = self.lbs_garment_MGN(
            pred, batch["tpose_smpl_vertices"],
            batch["tpose_smpl_root_joints"],
            batch["zeropose_smpl_vertices"], batch["pose"],
            batch["J_regressor"], batch["lbs_weights"])
        out["lbs_pred_garment_v"] = lbs_pred
        out["lbs_stage1_pred_garment_v"] = lbs_stage1
        out["iter_regressed_lbs_garment_v"] = [lbs_pred]
        return out
