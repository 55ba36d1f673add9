"""High-level inference API.

One-object front door for users migrating from the reference: build the
model for a garment, load weights (reference torch .ckpt or our orbax dir),
and reconstruct garments from point-cloud sequences - the programmatic
equivalent of `scripts/test/test_*.sh`.

    recon = GarmentReconstructor.from_assets(assets, body_model,
                                             checkpoint="pretrain/skirt.ckpt")
    canonical = recon.canonical(pcd)            # (B, Vg, 3) T-pose garment
    posed = recon.posed(pcd, body_inputs)       # (B, T, Vg, 3) per-frame
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax

from garment4d_tpu.models import (
    BodyInputs,
    CanonicalGarmentModel,
    GarmentAssets,
    PosedGarmentModel,
)
from garment4d_tpu.smpl import SmplModel


@dataclasses.dataclass
class GarmentReconstructor:
    assets: GarmentAssets
    model: PosedGarmentModel
    canonical_model: CanonicalGarmentModel
    variables: dict

    @classmethod
    def from_assets(cls, assets: GarmentAssets, body_model: SmplModel,
                    checkpoint: Optional[str] = None, lbs_k: int = 256,
                    iterations: int = 3, example_shape=(1, 2, 1024)):
        """Build the posed-stage model (the flagship), optionally loading a
        checkpoint (torch .ckpt with the reference's key naming, or an orbax
        directory)."""
        from garment4d_tpu.data.synthetic import make_batch
        from garment4d_tpu.train.step import body_inputs_from_batch

        model = PosedGarmentModel(
            assets=assets,
            body_faces=body_model.faces,
            lbs_k=lbs_k, iterations=iterations)
        B, T, N = example_shape
        example = make_batch(assets, body_model, batch_size=B, T=T, npoints=N)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), example["pcd"],
            body_inputs_from_batch(example), train=False)
        if checkpoint:
            from garment4d_tpu.train.checkpoint import load_pretrained

            variables, report = load_pretrained(checkpoint, variables)
            if report["skipped"]:
                import logging

                logging.getLogger("garment4d_tpu").warning(
                    "checkpoint: %d tensors skipped", len(report["skipped"]))
        canonical = CanonicalGarmentModel(assets=assets)
        return cls(assets=assets, model=model, canonical_model=canonical,
                   variables=variables)

    def _canonical_variables(self):
        return {coll: tree["canonical"]
                for coll, tree in self.variables.items()
                if isinstance(tree, dict) and "canonical" in tree}

    def canonical(self, pcd) -> np.ndarray:
        """pcd: (B, T, N, 3) -> canonical T-pose garment (B, Vg, 3)."""
        out = jax.jit(
            lambda v, p: self.canonical_model.apply(v, p, train=False)
        )(self._canonical_variables(), pcd)
        return np.asarray(out.tpose_garment)

    def posed(self, pcd, body: BodyInputs, return_all: bool = False):
        """pcd: (B, T, N, 3) + body inputs -> posed garment (B, T, Vg, 3)
        (final GCN iteration; `return_all=True` gives the full PosedOutput)."""
        out = jax.jit(
            lambda v, p, b: self.model.apply(v, p, b, train=False)
        )(self.variables, pcd, body)
        if return_all:
            return out
        return np.asarray(out.iter_garment_v[-1])

    def segment(self, pcd) -> np.ndarray:
        """Per-point semantic labels (B, T, N) int (0-based classes)."""
        out = jax.jit(
            lambda v, p: self.canonical_model.apply(v, p, train=False)
        )(self._canonical_variables(), pcd)
        B, T = pcd.shape[:2]
        return np.asarray(out.backbone.sem_logits.argmax(-1)).reshape(B, T, -1)
