"""PointNet++ set-abstraction and feature-propagation modules.

Channel-last re-design of the reference's L2 modules
(`modules/pointnet2/pointnet2/pointnet2_modules.py`): FPS -> gather ->
ball-query group -> SharedMLP -> max-pool per scale; three-NN inverse-distance
interpolation for upsampling. All neighbourhood tensors are (B, M, S, C) so
the MLPs are dense matmuls over the last axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from garment4d_tpu import ops
from garment4d_tpu.nn.layers import SharedMLP

Array = jax.Array


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference
    `pointnet2_modules.py:10-92`).

    npoint=None means "group all" (single global neighbourhood,
    reference `PointnetSAModule` with `GroupAll`).
    """

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # output widths per scale (input inferred)
    use_xyz: bool = True
    bn: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None  # computation dtype of the MLP stacks

    @nn.compact
    def __call__(self, xyz: Array, features: Optional[Array],
                 train: bool = False,
                 new_xyz: Optional[Array] = None) -> Tuple[Optional[Array], Array]:
        """xyz: (B, N, 3); features: (B, N, C) or None ->
        (new_xyz (B, npoint, 3) | None, new_features (B, npoint, sum C_out))."""
        if new_xyz is None and self.npoint is not None:
            idx = ops.furthest_point_sample(xyz, self.npoint)
            new_xyz = ops.gather_points(xyz, idx)

        # eval-mode fusion: with running-stats BN each ConvBNRelu is a
        # folded affine + ReLU, so the whole scale (gather, rel-xyz, MLP
        # stack, sample max) runs as one VMEM-resident kernel and the
        # (B, M, S, C) neighbourhoods never reach HBM (ops/pallas/fusedpe.py).
        # TPU-only so the CPU path keeps the reference op-for-op numerics.
        from garment4d_tpu.ops.pallas.fusedpe import chain_supported

        fuse_ok = (not train and self.bn and self.dtype is None
                   and self.use_xyz and self.npoint is not None
                   and jax.default_backend() == "tpu")
        c_in = 3 + (features.shape[-1] if features is not None else 0)

        fuse_scale = [
            fuse_ok and chain_supported(xyz.shape[1], c_in, self.nsamples[i],
                                        tuple(self.mlps[i]),
                                        m=new_xyz.shape[1])
            for i in range(len(self.mlps))
        ]
        # ONE multi-radius dispatch for all fused scales: the query kernel
        # shares the distance tile across radii and packs two radii's hit
        # masks into each prefix scan (ops/pallas/ball_query.py), so issuing
        # an MSG stage as per-radius queries re-pays the distance + scan
        # phases per scale — measured 31.7 -> ~23 ms on the posed stage's
        # sa1 (1024 centers x 6890 points x 2 radii) at production shapes.
        qidxs = {}
        if sum(fuse_scale) >= 2:
            fused_is = [i for i, f in enumerate(fuse_scale) if f]
            multi = ops.ball_query_multi(
                tuple(self.radii[i] for i in fused_is),
                tuple(self.nsamples[i] for i in fused_is), xyz, new_xyz)
            qidxs = dict(zip(fused_is, multi))

        outs = []
        for i in range(len(self.mlps)):
            mlp = SharedMLP(self.mlps[i], bn=self.bn,
                            bn_axis_name=self.bn_axis_name,
                            dtype=self.dtype, name=f"mlp{i}")
            if fuse_scale[i]:
                ws, bs = mlp.folded(c_in)
                qidx = qidxs[i] if i in qidxs else ops.ball_query(
                    self.radii[i], self.nsamples[i], xyz, new_xyz)
                table = (jnp.concatenate([xyz, features], axis=-1)
                         if features is not None else xyz)
                outs.append(ops.group_chain_max(
                    table, qidx, new_xyz, ws, bs, (True,) * len(ws)))
                continue
            if self.npoint is not None:
                grouped = ops.query_and_group(
                    self.radii[i], self.nsamples[i], xyz, new_xyz, features,
                    use_xyz=self.use_xyz)  # (B, M, S, 3+C)
            else:
                grouped = ops.group_all(xyz, features, use_xyz=self.use_xyz)
            feat = mlp(grouped, train=train)
            outs.append(jnp.max(feat, axis=2))  # max over samples
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SAModule(SAModuleMSG):
    """Single-scale convenience wrapper (reference `pointnet2_modules.py:95-113`)."""

    @classmethod
    def create(cls, *, mlp, npoint=None, radius=None, nsample=None, **kw):
        return cls(npoint=npoint, radii=[radius], nsamples=[nsample],
                   mlps=[mlp], **kw)


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + SharedMLP
    (reference `pointnet2_modules.py:116-156`)."""

    mlp: Sequence[int]
    bn: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, unknown: Array, known: Optional[Array],
                 unknown_feats: Optional[Array], known_feats: Array,
                 train: bool = False) -> Array:
        """unknown: (B, N, 3), known: (B, M, 3), unknown_feats: (B, N, C1)|None,
        known_feats: (B, M, C2) -> (B, N, mlp[-1])."""
        if known is not None:
            dist, idx = ops.three_nn(unknown, known)
            weight = ops.interp_weights_from_dists(dist)
            interpolated = ops.three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1]))

        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated
        return SharedMLP(self.mlp, bn=self.bn, bn_axis_name=self.bn_axis_name,
                         dtype=self.dtype, name="mlp")(new_features, train=train)
