"""PointNet++ multi-scale-grouping semantic-segmentation backbone.

Parity with reference `modules/pointnet2encoder.py:18-144` (Pointnet2MSGSEG):
3 MSG set-abstraction stages (1024/256/64 centres), optional global stage,
3 feature-propagation stages, Conv-Dropout-Conv segmentation head over 7
classes. Channel-last throughout.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from garment4d_tpu.models.assets import CLASS_NUM
from garment4d_tpu.nn import ConvBNRelu, FPModule, SAModuleMSG

Array = jax.Array


class BackboneOutput(NamedTuple):
    global_feat: Optional[Array]   # (B, 512) or None
    sem_logits: Array              # (B, N, num_classes)
    features: tuple                # per-level features, [0] = (B, N, 64) FP out
    xyz: tuple                     # per-level xyz, [0] = input (B, N, 3)


class PointNet2SegBackbone(nn.Module):
    num_classes: int = CLASS_NUM
    use_xyz: bool = True
    bn: bool = True
    global_feat: bool = True
    bn_axis_name: Optional[str] = None
    # bf16 computation for the SA/FP/head dense stacks (params and geometry
    # stay f32); None = f32, bit-parity with the reference
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pointcloud: Array, train: bool = False) -> BackboneOutput:
        """pointcloud: (B, N, 3 [+ C]) -> BackboneOutput.

        SA widths/radii per reference `pointnet2encoder.py:41-76`; FP widths
        per `:91-96`; head per `:98-101`.
        """
        kw = dict(use_xyz=self.use_xyz, bn=self.bn,
                  bn_axis_name=self.bn_axis_name, dtype=self.compute_dtype)
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        sa_modules = [
            SAModuleMSG(npoint=1024, radii=(0.05, 0.1), nsamples=(16, 32),
                        mlps=((16, 16, 32), (32, 32, 64)), name="sa1", **kw),
            SAModuleMSG(npoint=256, radii=(0.1, 0.2), nsamples=(16, 32),
                        mlps=((32, 32, 64), (64, 64, 128)), name="sa2", **kw),
            SAModuleMSG(npoint=64, radii=(0.2, 0.4), nsamples=(32, 64),
                        mlps=((64, 64, 128), (128, 128, 256)), name="sa3", **kw),
        ]
        l_xyz = [xyz]
        l_features = [features]
        for sa in sa_modules:
            li_xyz, li_feat = sa(l_xyz[-1], l_features[-1], train=train)
            l_xyz.append(li_xyz)
            l_features.append(li_feat)

        if self.global_feat:
            _, middle = SAModuleMSG(npoint=None, radii=(None,), nsamples=(None,),
                                    mlps=((256, 512),), name="middle", **kw)(
                l_xyz[-1], l_features[-1], train=train)
            middle = middle.reshape(middle.shape[0], -1)
        else:
            middle = None

        fpkw = dict(bn=self.bn, bn_axis_name=self.bn_axis_name,
                    dtype=self.compute_dtype)
        fp_modules = [
            FPModule(mlp=(128, 64), name="fp1", **fpkw),
            FPModule(mlp=(256, 128), name="fp2", **fpkw),
            FPModule(mlp=(512, 256), name="fp3", **fpkw),
        ]
        for i in range(-1, -4, -1):  # top-down: coarse -> fine
            l_features[i - 1] = fp_modules[i](
                l_xyz[i - 1], l_xyz[i], l_features[i - 1], l_features[i], train=train)

        x = ConvBNRelu(32, bn=True, bn_axis_name=self.bn_axis_name,
                       dtype=self.compute_dtype,
                       name="head0")(l_features[0], train=train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        sem_logits = ConvBNRelu(self.num_classes, bn=False, relu=False,
                                dtype=self.compute_dtype, name="head1")(x)

        # downstream consumers (losses, garment selection, posed stage) run
        # in f32 regardless of the backbone's computation dtype
        as32 = (lambda a: None if a is None else a.astype(jnp.float32))
        return BackboneOutput(
            global_feat=as32(middle),
            sem_logits=as32(sem_logits),
            features=tuple(as32(f) for f in l_features),
            xyz=tuple(l_xyz),
        )
