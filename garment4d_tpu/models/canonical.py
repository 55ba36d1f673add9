"""Canonical-stage garment model ("GarmentPCA").

Parity with reference `modules/mesh_encoder.py:43-169` (PCAGarmentEncoderSeg):
per-frame PointNet++ semantic segmentation, fixed-size garment point
selection from predicted labels, a 2-stage MSG garment encoder + global
summary, temporal max-pool and a small head regressing PCA coefficients of
the canonical garment mesh.

The reference's dynamic-shape python loop over predicted labels
(`mesh_encoder.py:109-125`) becomes a static-shape rank-scatter: take the
first `n` garment-class points in index order, zero-pad - identical
semantics, fully jittable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from garment4d_tpu.models.assets import GarmentAssets
from garment4d_tpu.models.backbone import BackboneOutput, PointNet2SegBackbone
from garment4d_tpu.nn import ConvBNRelu, SAModuleMSG

Array = jax.Array


def select_garment_points(xyz: Array, features: Array, labels: Array,
                          garment_label: int, n: int):
    """Select the first `n` points with label == garment_label, zero-padded.

    xyz: (B, N, 3), features: (B, N, C), labels: (B, N) int ->
    ((B, n, 3), (B, n, C)). Matches reference `calc_segmentation_results`
    (`mesh_encoder.py:109-125`): truncate to the first n in index order,
    zero-pad when fewer.
    """
    mask = labels == garment_label  # (B, N)
    cum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    targets = jnp.arange(1, n + 1, dtype=jnp.int32)
    # "index of the (s+1)-th garment point" = #{cum < s+1} on the monotone
    # cumulative count. A dense compare+reduce fuses into one VPU pass;
    # jnp.searchsorted's binary-search scan lowered to a sequential
    # while-loop costing ~35 ms/forward at production shapes.
    idx = jnp.sum((cum[:, None, :] < targets[None, :, None]).astype(jnp.int32),
                  axis=-1)
    valid = targets[None, :] <= cum[:, -1:]  # (B, n)
    idx = jnp.where(valid, idx, 0).astype(jnp.int32)
    sel_xyz = jnp.where(valid[..., None], gather_points_local(xyz, idx), 0.0)
    sel_feat = jnp.where(valid[..., None], gather_points_local(features, idx), 0.0)
    return sel_xyz, sel_feat


def gather_points_local(points: Array, idx: Array) -> Array:
    return jnp.take_along_axis(points, idx[..., None], axis=1)


class CanonicalOutput(NamedTuple):
    backbone: BackboneOutput
    garment_xyz: tuple          # garment-encoder per-level xyz (BT, ., 3)
    garment_features: tuple     # garment-encoder per-level features
    garment_summary: Optional[Array]  # (B, T, 512)
    pca_coeff: Optional[Array]  # (B, pca_dim)
    tpose_garment: Optional[Array]  # (B, V, 3)


class CanonicalGarmentModel(nn.Module):
    """Stage 1: point-cloud sequence -> canonical garment mesh."""

    assets: GarmentAssets
    only_seg: bool = False
    bn_axis_name: Optional[str] = None
    # bf16 computation for the backbone / garment-encoder dense stacks
    # (params, geometry, PCA head stay f32); None = reference bit-parity
    compute_dtype: Optional[jnp.dtype] = None

    def pca_inverse_transform(self, coeff: Array) -> Array:
        """(B, pca_dim) -> (B, V, 3); reference `mesh_encoder.py:101-107`.

        The PCA basis lives in the 'constants' variable collection (a runtime
        input, not an HLO constant - keeps compiles fast and the basis
        swappable per template)."""
        comp = self.variable("constants", "pca_components",
                             lambda: jnp.asarray(self.assets.pca_components)).value
        mean = self.variable("constants", "pca_mean",
                             lambda: jnp.asarray(self.assets.pca_mean)).value
        scale = self.variable("constants", "pca_scale",
                              lambda: jnp.asarray(self.assets.pca_scale)).value
        flat = (jnp.einsum("bk,kd->bd", coeff, comp,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) + mean) * scale
        return flat.reshape(coeff.shape[0], -1, 3)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> CanonicalOutput:
        """x: (B, T, N, 3) point-cloud sequence."""
        B, T, N, C = x.shape
        flat = x.reshape(B * T, N, C)

        backbone = PointNet2SegBackbone(
            global_feat=False, bn_axis_name=self.bn_axis_name,
            compute_dtype=self.compute_dtype,
            name="pointnet")(flat, train=train)

        if self.only_seg:
            return CanonicalOutput(backbone, (), (), None, None, None)

        labels = jax.lax.stop_gradient(jnp.argmax(backbone.sem_logits, axis=-1))
        garment_v, garment_f = select_garment_points(
            backbone.xyz[0], backbone.features[0], labels,
            self.assets.label, N // 4)

        kw = dict(use_xyz=True, bn=True, bn_axis_name=self.bn_axis_name,
                  dtype=self.compute_dtype)
        # garment encoder widths per reference `mesh_encoder.py:54-78`
        enc1 = SAModuleMSG(npoint=512, radii=(0.05, 0.1), nsamples=(16, 32),
                           mlps=((32, 32), (64, 64)), name="garment_sa1", **kw)
        enc2 = SAModuleMSG(npoint=64, radii=(0.2, 0.4), nsamples=(32, 64),
                           mlps=((128, 128), (256, 256)), name="garment_sa2", **kw)
        summarize = SAModuleMSG(npoint=None, radii=(None,), nsamples=(None,),
                                mlps=((512, 512),), name="garment_summarize", **kw)

        g_xyz = [garment_v]
        g_feat = [garment_f]
        for enc in (enc1, enc2):
            xyz_i, feat_i = enc(g_xyz[-1], g_feat[-1], train=train)
            g_xyz.append(xyz_i)
            g_feat.append(feat_i)
        _, summary = summarize(g_xyz[-1], g_feat[-1], train=train)
        summary = summary.reshape(B, T, 512)

        pooled = jnp.max(summary, axis=1)  # temporal max-pool (B, 512)
        # PCA head per reference `mesh_encoder.py:79-87` (Conv1d stack on a
        # length-1 axis == dense stack with batch-only BN). Unlike the
        # pt_utils conv blocks, the reference uses RAW nn.Conv1d here, which
        # keeps its bias even under the following BatchNorm - so the released
        # checkpoints carry PCAEncoder.{0,3}.bias and the flax layers must too
        h = ConvBNRelu(128, bn=True, bias=True, bn_axis_name=self.bn_axis_name,
                       name="pca_head0")(pooled, train=train)
        h = ConvBNRelu(64, bn=True, bias=True, bn_axis_name=self.bn_axis_name,
                       name="pca_head1")(h, train=train)
        coeff = ConvBNRelu(self.assets.pca_dim, bn=False, relu=False,
                           name="pca_head2")(h)

        tpose_garment = self.pca_inverse_transform(coeff.astype(jnp.float32))
        # downstream (posed stage, losses) runs f32 regardless of the
        # encoder computation dtype
        return CanonicalOutput(
            backbone=backbone,
            garment_xyz=tuple(g_xyz),
            garment_features=tuple(f.astype(jnp.float32) for f in g_feat),
            garment_summary=summary.astype(jnp.float32),
            pca_coeff=coeff.astype(jnp.float32),
            tpose_garment=tpose_garment,
        )
