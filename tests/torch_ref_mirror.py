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
                "garment_v": garment_v}
