"""Layout pin: a no-op Pallas copy used to force a row-major boundary.

Why this exists (docs/PERFORMANCE.md, "layout economics"): in the geneval
graph XLA lays the generator's conv activations out batch-minor
(``{0,3,2,1}`` — lanes carry the batch), and in that layout the stage-3
upsample-conv (the single hottest op, bf16[128,256,256,128]) runs at
21.1 ms/batch, while the SAME op measured with row-major entry layouts runs
at 13.8 ms.  A Pallas custom call fixes its operand/result layouts to
row-major, so inserting an identity kernel right before the upconv is the
only lever we have over XLA's intra-graph layout assignment: the copy costs
~1.5 ms of HBM round-trip (537 MB block) and, IF layout assignment then
keeps the conv row-major instead of copying straight back, nets ~5-6 ms.

Whether XLA cooperates is measured, not predicted (``T2IGAN_LAYOUT_PIN=1``
A/B at the full-graph level, tools/chip_queue_extra.sh) — the same trace
shows isolated-op reasoning misleads in this graph.  Eval-path only; the
op is semantically the identity so there is nothing to differentiate
through in the sweeps that use it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def layout_pin(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Identity on [B, H, W, C], materialized row-major at a custom-call
    boundary.  The Mosaic tile rule constrains the two minor dims of the
    block: W to a multiple of 8 and C to a multiple of 128."""
    b, h, w, c = x.shape
    assert w % 8 == 0 and c % 128 == 0, (w, c)
    rows = 8 if h % 8 == 0 else h
    return pl.pallas_call(
        _copy_kernel,
        grid=(b, h // rows),
        in_specs=[pl.BlockSpec((1, rows, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, rows, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)
