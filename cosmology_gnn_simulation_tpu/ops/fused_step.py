"""Fused message-passing step tail: one Pallas pass per step.

The pruned sender-latents InteractionNetwork step (SURVEY.md C11/C13;
reference counterpart ``/root/reference/graph_network.py:89-96``) spends
most of its non-gather time in a chain of small ops XLA materializes
separately — ``relu(x @ w_self + agg + b0)``, a hidden Linear+ReLU, the
final Linear, LayerNorm, and the residual add each read/write a full
``[N, H]`` f32 tensor to HBM (~600 MB/step at N=65k, H=128; measured
~1.8 ms of the 2.7 ms step against a ~0.3 ms traffic floor).

This kernel computes the whole tail in one row-tile pass:

    out = x + LN( W2 @ relu( W1 @ relu( x @ w_self + agg + b0 ) ) )

Per ``QB``-row tile: read ``x`` and ``agg`` once, keep every intermediate
in VMEM/registers, run the three matmuls back-to-back on the MXU (bf16
operands, f32 accumulation — identical precision policy to the unfused
``dense(..., dtype=bfloat16)`` path), LayerNorm in f32, and write the
residual-added rows once. HBM traffic drops to read-x + read-agg +
write-out.

Rows are independent, so the kernel applies unchanged to particle rows
(gather aggregation) and slot rows (cell-block aggregation); empty/padding
rows compute garbage that downstream never reads (LayerNorm keeps them
finite: rsqrt(var + eps)).

Numerics: matches the unfused path's dtype policy (operands cast to
``dtype``, f32 accumulation, f32 LayerNorm) but is not bit-identical —
the fused matmul's K-dim tiling may sum in a different order, the same
class of difference as any XLA re-fusion. Tests pin agreement at
tolerance against the unfused oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cosmology_gnn_simulation_tpu.models.mlp import LN_EPS

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def _tail_kernel(num_hidden: int, dtype, carry_dtype):
    """relu(x@w0 + agg + b0) -> [hidden Linears+ReLU] -> final Linear ->
    LN -> + x. Weight refs arrive flattened: w0, b0, (w_i, b_i)*, w_f, b_f,
    ln_scale, ln_bias."""

    # f32 operands: request the multi-pass matmul. NOTE (probe-measured,
    # benchmarks/verify_fused_tpu.py round 3): on the real backend Mosaic
    # honors HIGHEST only partially — ~1.5e-3 relative error per matmul vs
    # XLA-level HIGHEST's ~7e-4 and true f32's ~1e-6. The wrapper therefore
    # REJECTS f32 mode on real TPU; interpret mode (CPU tests) is exact.
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    def mm(a, w):
        return jnp.dot(
            a.astype(dtype), w, preferred_element_type=jnp.float32,
            precision=precision,
        )

    def kernel(x_ref, agg_ref, *refs):
        out_ref = refs[-1]
        w_refs = refs[:-1]
        x = x_ref[...]
        w0 = w_refs[0][...].astype(dtype)
        b0 = w_refs[1][...]
        h = mm(x, w0)
        h = jax.nn.relu(h + agg_ref[...].astype(jnp.float32) + b0)
        idx = 2
        for _ in range(num_hidden):
            w = w_refs[idx][...].astype(dtype)
            b = w_refs[idx + 1][...]
            h = jax.nn.relu(mm(h, w) + b)
            idx += 2
        wf = w_refs[idx][...].astype(dtype)
        bf = w_refs[idx + 1][...]
        y = mm(h, wf) + bf
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + LN_EPS)
        y = y * w_refs[idx + 2][...] + w_refs[idx + 3][...]
        out_ref[...] = (x.astype(jnp.float32) + y).astype(carry_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dtype", "row_block", "interpret"),
)
def fused_step_tail(
    x: jnp.ndarray,
    agg: jnp.ndarray,
    node_params,
    *,
    dtype=jnp.bfloat16,
    row_block: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``x + LN(node_mlp(relu(x @ w_self + agg + b0)))`` in one fused pass.

    Args:
      x:    ``[N, L]`` carried latents (f32 or bf16 — output keeps this
            dtype, matching the scan carry).
      agg:  ``[N, H]`` aggregated neighbor contribution (``z`` gather+sum or
            the cell-block kernel output), pre-``w_self`` space — i.e. the
            ``agg_h`` operand of ``_pruned_processor_step``.
      node_params: the step's ``node`` MLP params (``{"layers": (...),
            "ln": ...}``); ``layers[0].w`` is ``[2L, H]`` — only the
            ``w_self`` half (rows ``< L``) is consumed here, the ``w_agg``
            half is applied by the caller before aggregation.
      dtype: matmul operand dtype (f32 accumulation either way).

    Returns ``[N, L]`` in ``x.dtype``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and jnp.dtype(dtype) == jnp.float32:
        raise ValueError(
            "fused_step_tail f32 mode is not supported on real TPU: Mosaic "
            "in-kernel f32 matmuls are ~1e-3 accurate even at "
            "Precision.HIGHEST (see module notes) — use dtype=bfloat16 "
            "(whose 0/1-exact products + f32 accumulation ARE exact here) "
            "or the unfused XLA path"
        )
    n, latent = x.shape
    layers = node_params["layers"]
    w0 = layers[0]["w"][:latent]  # w_self half
    flat = [w0, layers[0]["b"]]
    for layer in layers[1:-1]:
        flat += [layer["w"], layer["b"]]
    flat += [layers[-1]["w"], layers[-1]["b"]]
    flat += [node_params["ln"]["scale"], node_params["ln"]["bias"]]
    # Biases / LN params ride as [1, H] rows (TPU needs >=2-D operands).
    flat = [f if f.ndim == 2 else f[None, :] for f in flat]

    qb = min(row_block, _round_up(n, 8))
    pad = (-n) % qb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        agg = jnp.pad(agg, ((0, pad), (0, 0)))
    num_tiles = (n + pad) // qb

    def row_spec(h):
        return pl.BlockSpec((qb, h), lambda t: (t, 0))

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim)

    out = pl.pallas_call(
        _tail_kernel(len(layers) - 2, dtype, x.dtype),
        grid=(num_tiles,),
        in_specs=[row_spec(latent), row_spec(agg.shape[1])]
        + [const_spec(f) for f in flat],
        out_specs=row_spec(latent),
        out_shape=jax.ShapeDtypeStruct((n + pad, latent), x.dtype),
        interpret=interpret,
    )(x, agg, *flat)
    return out[:n] if pad else out
