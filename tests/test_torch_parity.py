"""Numerical parity vs torch layers (torch CPU is available in the image).

These pin the BatchNorm conventions (momentum, eps, biased/unbiased variance)
and the conv-as-dense weight layout against the exact torch modules the
reference uses - the riskiest places for silent checkpoint-import drift.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from garment4d_tpu.nn import ConvBNRelu


def make_flax_and_torch(C_in=5, C_out=7, seed=0):
    rng = np.random.RandomState(seed)
    w = rng.randn(C_out, C_in).astype(np.float32) * 0.3

    tconv = torch.nn.Conv2d(C_in, C_out, 1, bias=False)
    tbn = torch.nn.BatchNorm2d(C_out)  # momentum 0.1, eps 1e-5
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w[:, :, None, None]))
        tbn.weight.copy_(torch.from_numpy(rng.rand(C_out).astype(np.float32) + 0.5))
        tbn.bias.copy_(torch.from_numpy(rng.randn(C_out).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(rng.randn(C_out).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(rng.rand(C_out).astype(np.float32) + 0.5))

    variables = {
        "params": {"conv": {"kernel": jnp.asarray(w.T)},
                   "bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                          "bias": jnp.asarray(tbn.bias.detach().numpy())}},
        "batch_stats": {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                               "var": jnp.asarray(tbn.running_var.numpy())}},
    }
    return variables, tconv, tbn


class TestConvBNParity:
    def test_eval_mode_matches_torch(self, rng):
        variables, tconv, tbn = make_flax_and_torch()
        x = rng.randn(2, 10, 4, 5).astype(np.float32)  # (B, M, S, C)

        mod = ConvBNRelu(7, bn=True, relu=True)
        got = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))

        tconv.eval(); tbn.eval()
        with torch.no_grad():
            tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # (B, C, M, S)
            want = torch.relu(tbn(tconv(tx))).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_train_mode_normalisation_matches_torch(self, rng):
        variables, tconv, tbn = make_flax_and_torch(seed=1)
        x = rng.randn(2, 10, 4, 5).astype(np.float32)

        mod = ConvBNRelu(7, bn=True, relu=True)
        got, mutated = mod.apply(variables, jnp.asarray(x), train=True,
                                 mutable=["batch_stats"])

        tconv.train(); tbn.train()
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = torch.relu(tbn(tconv(tx))).permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

        # running mean update: torch does (1-momentum)*run + momentum*batch
        got_mean = np.asarray(mutated["batch_stats"]["bn"]["mean"])
        np.testing.assert_allclose(got_mean, tbn.running_mean.detach().numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_running_var_convention_documented(self, rng):
        """torch updates running_var with the UNBIASED batch var, flax with the
        biased one - negligible at reference batch sizes (B*M*S = 80+ items);
        this test documents the bounded difference."""
        variables, tconv, tbn = make_flax_and_torch(seed=2)
        x = rng.randn(2, 10, 4, 5).astype(np.float32)
        mod = ConvBNRelu(7, bn=True, relu=True)
        _, mutated = mod.apply(variables, jnp.asarray(x), train=True,
                               mutable=["batch_stats"])
        tconv.train(); tbn.train()
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        tbn(tconv(tx))
        got_var = np.asarray(mutated["batch_stats"]["bn"]["var"])
        want_var = tbn.running_var.detach().numpy()
        n = 2 * 10 * 4
        # correction factor n/(n-1) bounds the relative difference
        assert np.abs(got_var - want_var).max() / np.abs(want_var).max() < 1.0 / (n - 1) + 1e-3


class TestLinearParity:
    def test_dense_matches_torch_linear(self, rng):
        lin = torch.nn.Linear(6, 4)
        x = rng.randn(3, 6).astype(np.float32)
        import flax.linen as nn

        dense = nn.Dense(4)
        variables = {"params": {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy())}}
        got = np.asarray(dense.apply(variables, jnp.asarray(x)))
        want = lin(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
