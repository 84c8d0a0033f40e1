"""Surface-Networks VAE (mesh-MNIST generation), Lap and Dirac variants.

Parity: ``src/mesh_mnist/models_vae.py``.  The encoder reads the *lifted*
mesh through its operator; the decoder reconstructs on the *flat* (z=0) mesh
through the flat operator, with the latent tiled over vertices and a single
learned scalar output log-variance.  Sampling randomness is passed explicitly
(flax rng collection 'sample') so the whole model stays jit-pure.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from surfacenetworks_tpu.nn.blocks import dirac_num_faces, DirResNet2, LapResNet2
from surfacenetworks_tpu.nn.layers import GraphConv1x1, global_average

WIDTH = 128
LATENT = 100


class LapEncoder(nn.Module):
    """models_vae.py:22-51: conv1 -> 5x LapResNet2 -> 'pre' conv -> masked
    global average -> (mu, logvar) heads."""

    num_layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, op, mask):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.num_layers):
            x = LapResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, WIDTH, "pre", dtype=self.dtype, name="bn_conv2")(x)
        x = nn.elu(x)
        x = jnp.squeeze(global_average(x, mask), axis=-2)
        # latent heads promote to fp32 (fp32 params, default Dense dtype):
        # the reparametrization exp() and KLD always run full precision
        mu = nn.Dense(LATENT, name="fc_mu")(x.astype(jnp.float32))
        logvar = nn.Dense(LATENT, name="fc_logvar")(x.astype(jnp.float32))
        return mu, logvar


class LapDecoder(nn.Module):
    """models_vae.py:54-86: decode latent + flat coordinates on the flat
    operator; output mean adds the flat inputs (residual), logvar is one
    learned scalar broadcast to the output shape."""

    num_layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, noise, op, mask):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv_inputs")(inputs)
        x = x + GraphConv1x1(LATENT, WIDTH, None, dtype=self.dtype, name="conv_noise")(noise)
        for i in range(self.num_layers):
            x = LapResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, WIDTH, "pre", dtype=self.dtype, name="bn_conv2")(x)
        x = nn.elu(x)
        mu = GraphConv1x1(WIDTH, 3, None, dtype=self.dtype, name="fc_mu")(x)
        logvar = self.param("fc_logvar", nn.initializers.zeros, (1, 1, 1))
        mu = mu.astype(jnp.float32) + inputs  # reconstruction NLL is fp32
        y = jnp.broadcast_to(logvar, mu.shape)
        return mu, y


class LapVAE(nn.Module):
    """models_vae.py:88-114."""

    num_layers: int = 5
    dtype: Any = None

    def setup(self):
        self.encoder = LapEncoder(self.num_layers, dtype=self.dtype)
        self.decoder = LapDecoder(self.num_layers, dtype=self.dtype)

    def reparametrize(self, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        return eps * std + mu

    def __call__(self, x, flat_x, op, flat_op, mask):
        mu, logvar = self.encoder(x, op, mask)
        z = self.reparametrize(mu, logvar)
        z_tiled = jnp.repeat(z[:, None, :], flat_x.shape[1], axis=1)
        recon_mu, recon_logvar = self.decoder(flat_x, z_tiled, flat_op, mask)
        return recon_mu, recon_logvar, z, mu, logvar

    def decode(self, flat_x, noise, flat_op, mask):
        """Generative path (main_vae.py:242-249: fixed-noise sampling)."""
        return self.decoder(flat_x, noise, flat_op, mask)


class DirEncoder(nn.Module):
    """models_vae.py:117-155: Dirac blocks with zero-initialized face stream."""

    num_layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, op, mask):
        batch = inputs.shape[0]
        m = dirac_num_faces(op)
        v = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        f = jnp.zeros((batch, m, WIDTH), dtype=v.dtype)
        for i in range(self.num_layers):
            v, f = DirResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, v, f)
        x = nn.elu(v)
        x = GraphConv1x1(WIDTH, WIDTH, "pre", dtype=self.dtype, name="bn_conv2")(x)
        x = nn.elu(x)
        x = jnp.squeeze(global_average(x, mask), axis=-2)
        x = x.astype(jnp.float32)
        return nn.Dense(LATENT, name="fc_mu")(x), nn.Dense(LATENT, name="fc_logvar")(x)


class DirDecoder(nn.Module):
    """models_vae.py:158-198."""

    num_layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, noise, op, mask):
        batch = inputs.shape[0]
        m = dirac_num_faces(op)
        v = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv_inputs")(inputs)
        v = v + GraphConv1x1(LATENT, WIDTH, None, dtype=self.dtype, name="conv_noise")(noise)
        f = jnp.zeros((batch, m, WIDTH), dtype=v.dtype)
        for i in range(self.num_layers):
            v, f = DirResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, v, f)
        x = nn.elu(v)
        x = GraphConv1x1(WIDTH, WIDTH, "pre", dtype=self.dtype, name="bn_conv2")(x)
        x = nn.elu(x)
        mu = GraphConv1x1(WIDTH, 3, None, dtype=self.dtype, name="fc_mu")(x)
        logvar = self.param("fc_logvar", nn.initializers.zeros, (1, 1, 1))
        mu = mu.astype(jnp.float32) + inputs
        return mu, jnp.broadcast_to(logvar, mu.shape)


class DirVAE(nn.Module):
    """models_vae.py:200-226."""

    num_layers: int = 5
    dtype: Any = None

    def setup(self):
        self.encoder = DirEncoder(self.num_layers, dtype=self.dtype)
        self.decoder = DirDecoder(self.num_layers, dtype=self.dtype)

    def reparametrize(self, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        return eps * std + mu

    def __call__(self, x, flat_x, op, flat_op, mask):
        mu, logvar = self.encoder(x, op, mask)
        z = self.reparametrize(mu, logvar)
        z_tiled = jnp.repeat(z[:, None, :], flat_x.shape[1], axis=1)
        recon_mu, recon_logvar = self.decoder(flat_x, z_tiled, flat_op, mask)
        return recon_mu, recon_logvar, z, mu, logvar

    def decode(self, flat_x, noise, flat_op, mask):
        return self.decoder(flat_x, noise, flat_op, mask)
