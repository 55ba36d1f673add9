"""NN building blocks (flax.linen), channel-last.

TPU-native equivalents of the reference's L2 layer
(`modules/pointnet2/pointnet2/pytorch_utils.py` SharedMLP/Conv1d/Conv2d/FC and
`modules/pygcn/layers.py` GraphConvolution): 1x1 convolutions become plain
dense matmuls over the trailing channel axis (the MXU-friendly layout), and
the sparse GCN adjacency multiply becomes a dense MXU matmul.

BatchNorm matches torch semantics used by the reference (momentum 0.1 torch
== 0.9 flax, eps 1e-5, affine, running stats); pass `axis_name` to get the
SyncBatchNorm equivalent via a cross-replica psum (reference
`train_temporal.py:118-119`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from garment4d_tpu.ops import graph_matmul
from garment4d_tpu.ops.graph import graph_matmul_banded

Array = jax.Array


class ConvBNRelu(nn.Module):
    """Dense (=1x1 conv) + optional BatchNorm + optional ReLU over the last axis.

    Equivalent of `pytorch_utils.Conv1d/Conv2d` blocks (kernel 1, kaiming
    init, bias only when bn is off; `pytorch_utils.py:35-101,126-197`).
    """

    features: int
    bn: bool = True
    relu: bool = True
    bias: Optional[bool] = None  # default: bias only when bn is off
    bn_axis_name: Optional[str] = None
    # computation dtype (params stay f32): bf16 halves the MXU/VPU cost of
    # the dense stacks; None = f32 (bit-parity with the reference)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def _affine(self, x: Array, train: bool) -> Array:
        """Dense + BN without the ReLU (the affine part of the block)."""
        use_bias = self.bias if self.bias is not None else not self.bn
        x = nn.Dense(
            self.features,
            use_bias=use_bias,
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name="bn",
            )(x)
        return x

    def __call__(self, x: Array, train: bool = False) -> Array:
        x = self._affine(x, train)
        if self.relu:
            x = jax.nn.relu(x)
        return x

    def folded(self, c_in: int):
        """Eval-mode (W', b') with BN folded into the matmul: the block's
        affine part == x @ W' + b' under running-stats BN. Probes the real
        conv/bn modules with a basis matrix, so the parameter tree (and the
        torch-ckpt key mapping) is untouched."""
        probe = jnp.concatenate(
            [jnp.eye(c_in, dtype=jnp.float32),
             jnp.zeros((1, c_in), jnp.float32)], axis=0)
        out = self._affine(probe, False)  # (c_in + 1, features)
        return out[:c_in] - out[c_in:c_in + 1], out[c_in]


class SharedMLP(nn.Module):
    """Stack of ConvBNRelu blocks (reference `pytorch_utils.py:5-33`).

    `widths` are the output widths of each layer (the reference spec's leading
    input dim is inferred by flax).
    """

    widths: Sequence[int]
    bn: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def _run(self, x, train: bool, fold_c_in=None):
        blocks = [
            ConvBNRelu(w, bn=self.bn, bn_axis_name=self.bn_axis_name,
                       dtype=self.dtype, name=f"layer{i}")
            for i, w in enumerate(self.widths)
        ]
        if fold_c_in is not None:
            weights, biases = [], []
            cur = fold_c_in
            for block, w in zip(blocks, self.widths):
                wf, bf = block.folded(cur)
                weights.append(wf)
                biases.append(bf)
                cur = w
            return tuple(weights), tuple(biases)
        for block in blocks:
            x = block(x, train=train)
        return x

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self._run(x, train)

    def folded(self, c_in: int):
        """Per-layer eval-mode (W', b') lists with BN folded (see
        `ConvBNRelu.folded`); every layer of the stack is ReLU'd."""
        return self._run(None, False, fold_c_in=c_in)


class MLP(nn.Module):
    """Plain Linear/ReLU stack (positional-encoding MLPs,
    reference `mesh_encoder.py:205-258`)."""

    widths: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, name=f"linear{i}")(x)
            if i != len(self.widths) - 1:
                x = jax.nn.relu(x)
        return x


class GraphConvolution(nn.Module):
    """GCN layer: adj @ (x @ W) + b with U(-1/sqrt(F), 1/sqrt(F)) init.

    Reference `modules/pygcn/layers.py:15-58`; the batched spmm reshape trick
    becomes a single dense einsum on the MXU - or, when the adjacency is
    banded (`diag_offsets` set, see `ops.graph.cyclic_diagonals`), a few
    shifted multiply-adds that skip the ~99.7%-zero V x V matmul.
    """

    features: int
    diag_offsets: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: Array, adj: Array) -> Array:
        in_features = x.shape[-1]
        stdv = 1.0 / (self.features ** 0.5)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -stdv, stdv)

        weight = self.param("weight", init, (in_features, self.features))
        bias = self.param("bias", init, (self.features,))
        support = jnp.einsum("...vc,cf->...vf", x, weight,
                             preferred_element_type=jnp.float32)
        if self.diag_offsets is not None:
            out = graph_matmul_banded(adj, support, self.diag_offsets)
        else:
            out = graph_matmul(adj, support)
        return out + bias
