"""Spectral normalization for discriminator convolutions.

Parity target: the reference's ``SpectralNorm`` wrapper (spectral.py:14-68):
one power-iteration per forward maintaining ``u``/``v`` estimate vectors, the
weight reparameterized as ``w / sigma`` with ``sigma = u . W v`` where the
gradient flows through ``W`` only (``u``/``v`` are buffers).

TPU-first redesign: torch mutates module attributes in-place; in flax the
``u``/``v`` estimates live in a mutable ``"spectral"`` variable collection
threaded explicitly through the train step (updated when the collection is
mutable, frozen during eval) — the functional equivalent of the reference's
per-forward update.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SNConv(nn.Module):
    """2D convolution with spectral weight normalization.

    Matches the composition ``SpectralNorm(nn.Conv2d(...))`` used throughout
    the discriminators (model.py:645-672).  NHWC layout.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: int = 1
    padding: Any = 1
    use_bias: bool = True
    power_iterations: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", jax.nn.initializers.orthogonal(),
            (kh, kw, in_features, self.features), jnp.float32)
        # Flatten with the output channel leading, like the reference's
        # ``w.view(height, -1)`` (spectral.py:30); sigma is invariant to the
        # ordering of the flattened axis.
        w2d = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(self.features, -1)
        height, width = w2d.shape

        # u/v start as fixed-seed random unit vectors (the reference draws
        # them from N(0,1) once at construction, spectral.py:53-56); the
        # estimates converge after a few power iterations either way.
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(jax.random.normal(
                jax.random.PRNGKey(17), (height,))))
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2normalize(jax.random.normal(
                jax.random.PRNGKey(23), (width,))))

        u, v = u_var.value, v_var.value
        w_sg = jax.lax.stop_gradient(w2d)
        for _ in range(self.power_iterations):
            v = _l2normalize(w_sg.T @ u)
            u = _l2normalize(w_sg @ v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        # Persist the running estimates when the caller allows mutation
        # (training); frozen otherwise (eval), matching buffer semantics.
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            u_var.value = u
            v_var.value = v
        # sigma differentiates through W (numerator and denominator), as in
        # spectral.py:34-35.
        sigma = jnp.dot(u, w2d @ v)
        kernel_bar = (kernel / sigma).astype(self.dtype)

        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        # no preferred_element_type: TPU accumulates bf16 convs in f32
        # internally, and a widened output dtype breaks the conv VJP under
        # mixed precision (cotangent/kernel dtype mismatch).
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel_bar,
            window_strides=(self.strides, self.strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", jax.nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)
