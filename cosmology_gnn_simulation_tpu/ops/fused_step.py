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

Backward (round 4): ``fused_step_tail`` carries a ``jax.custom_vjp`` whose
backward is a SECOND fused Pallas pass — per row tile it recomputes the
forward chain from (x, agg) (nothing but the kernel inputs is saved), then
walks the chain in reverse: LayerNorm backward, the three transposed
matmuls, ReLU masks. Weight/bias/LN gradients accumulate across grid steps
in VMEM-resident f32 output blocks (constant index maps, init at
``program_id == 0``); bias-like [H] gradients are PACKED as rows of two
``[8, H]`` accumulators because sublane-1 output blocks are a Mosaic
backend reject (CLAUDE.md). HBM traffic of the whole backward step is
read-(x, agg, g) + write-(dx, dagg) — the ~15 [N, H] intermediate
round-trips of the unfused XLA backward disappear, and under
``remat_chunk`` training the recompute-forward inside the backward is the
fused kernel too.
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


def _tail_bwd_kernel(num_hidden, dtype, x_dtype, agg_dtype, rows_h, rows_l):
    """Fused recompute-backward of the step tail (see module docstring).

    Ref order: x, agg, g, <flat weights>, then outputs
    dx, dagg, dw0, dw_hidden*, dwf, acc_h [rows_h, H] (rows = db0,
    db_hidden*), acc_l [rows_l, L] (rows = dbf, dscale, dbias).
    """
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    def dg(a, b, dims):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    def mm(a, w):  # a @ w
        return dg(a, w, ((1,), (0,)))

    def mm_nt(a, w):  # a @ w.T
        return dg(a, w, ((1,), (1,)))

    def mm_tn(a, b):  # a.T @ b  (weight-gradient contraction over rows)
        return dg(a, b, ((0,), (0,)))

    n_w = 6 + 2 * num_hidden

    def kernel(x_ref, agg_ref, g_ref, *refs):
        w_refs = refs[:n_w]
        dx_ref, dagg_ref, dw0_ref = refs[n_w:n_w + 3]
        dwh_refs = refs[n_w + 3:n_w + 3 + num_hidden]
        dwf_ref, acch_ref, accl_ref = refs[n_w + 3 + num_hidden:]

        x = x_ref[...]
        agg = agg_ref[...].astype(jnp.float32)
        g = g_ref[...].astype(jnp.float32)
        w0 = w_refs[0][...]
        # Recompute the forward chain (identical op order to _tail_kernel).
        pre0 = mm(x, w0) + agg + w_refs[1][...]
        h = jax.nn.relu(pre0)
        pres, hs = [pre0], [h]
        idx = 2
        for _ in range(num_hidden):
            pre = mm(h, w_refs[idx][...]) + w_refs[idx + 1][...]
            h = jax.nn.relu(pre)
            pres.append(pre)
            hs.append(h)
            idx += 2
        wf = w_refs[idx][...]
        y = mm(h, wf) + w_refs[idx + 1][...]
        scale = w_refs[idx + 2][...]
        mean = jnp.mean(y, axis=-1, keepdims=True)
        yc = y - mean
        var = jnp.mean(yc * yc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + LN_EPS)
        yn = yc * rstd

        # LayerNorm backward (dout = g; out = x + yn * scale + bias).
        dyn = g * scale
        m1 = jnp.mean(dyn, axis=-1, keepdims=True)
        m2 = jnp.mean(dyn * yn, axis=-1, keepdims=True)
        dy = rstd * (dyn - m1 - yn * m2)
        dscale = jnp.sum(g * yn, axis=0, keepdims=True)
        dbias = jnp.sum(g, axis=0, keepdims=True)
        dwf = mm_tn(hs[-1], dy)
        dbf = jnp.sum(dy, axis=0, keepdims=True)
        dh = mm_nt(dy, wf)
        dwh, dbh = [], []
        for i in range(num_hidden - 1, -1, -1):
            dpre = jnp.where(pres[i + 1] > 0, dh, 0.0)
            dwh.append(mm_tn(hs[i], dpre))
            dbh.append(jnp.sum(dpre, axis=0, keepdims=True))
            dh = mm_nt(dpre, w_refs[2 + 2 * i][...])
        dwh.reverse()
        dbh.reverse()
        dpre0 = jnp.where(pre0 > 0, dh, 0.0)
        dw0 = mm_tn(x, dpre0)
        db0 = jnp.sum(dpre0, axis=0, keepdims=True)
        dx_ref[...] = (g + mm_nt(dpre0, w0)).astype(x_dtype)
        dagg_ref[...] = dpre0.astype(agg_dtype)

        # Weight/bias accumulators: VMEM-resident across sequential grid
        # steps (constant index maps); zero-init on the first step. Bias
        # rows pack into [rows, H] blocks (sublane-1 outputs are a Mosaic
        # backend reject).
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dw0_ref[...] = jnp.zeros(dw0_ref.shape, jnp.float32)
            for r in dwh_refs:
                r[...] = jnp.zeros(r.shape, jnp.float32)
            dwf_ref[...] = jnp.zeros(dwf_ref.shape, jnp.float32)
            acch_ref[...] = jnp.zeros(acch_ref.shape, jnp.float32)
            accl_ref[...] = jnp.zeros(accl_ref.shape, jnp.float32)

        dw0_ref[...] += dw0
        for i in range(num_hidden):
            dwh_refs[i][...] += dwh[i]
        dwf_ref[...] += dwf
        ri_h = jax.lax.broadcasted_iota(jnp.int32, acch_ref.shape, 0)
        acc_h = jnp.where(ri_h == 0, db0, 0.0)
        for i in range(num_hidden):
            acc_h = acc_h + jnp.where(ri_h == i + 1, dbh[i], 0.0)
        acch_ref[...] += acc_h
        ri_l = jax.lax.broadcasted_iota(jnp.int32, accl_ref.shape, 0)
        accl_ref[...] += (
            jnp.where(ri_l == 0, dbf, 0.0)
            + jnp.where(ri_l == 1, dscale, 0.0)
            + jnp.where(ri_l == 2, dbias, 0.0)
        )

    return kernel


def _pad_rows(arr, qb):
    pad = (-arr.shape[0]) % qb
    return jnp.pad(arr, ((0, pad), (0, 0))) if pad else arr


def _row_spec(qb, h):
    return pl.BlockSpec((qb, h), lambda t: (t, 0))


def _const_spec(a):
    return pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim)


def _acc_spec(shape):
    return pl.BlockSpec(shape, lambda t: (0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _tail_core(num_hidden, dtype, row_block, interpret, x, agg, flat):
    """Differentiable fused tail over pre-flattened 2-D weight arrays.

    ``flat`` = (w_self, b0, (w_i, b_i)*, w_final, b_final, ln_scale,
    ln_bias), every entry 2-D (biases as [1, H] rows). Statics lead so
    ``jax.custom_vjp(nondiff_argnums=...)`` can carry them."""
    n, latent = x.shape
    qb = min(row_block, _round_up(n, 8))
    xp, aggp = _pad_rows(x, qb), _pad_rows(agg, qb)
    num_tiles = xp.shape[0] // qb
    out = pl.pallas_call(
        _tail_kernel(num_hidden, dtype, x.dtype),
        grid=(num_tiles,),
        in_specs=[_row_spec(qb, latent), _row_spec(qb, agg.shape[1])]
        + [_const_spec(f) for f in flat],
        out_specs=_row_spec(qb, latent),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], latent), x.dtype),
        interpret=interpret,
    )(xp, aggp, *flat)
    return out[:n] if xp.shape[0] != n else out


def _tail_core_fwd(num_hidden, dtype, row_block, interpret, x, agg, flat):
    # Save only the kernel INPUTS — the backward pass recomputes the chain
    # per tile in VMEM (free under remat-style training, where the forward
    # is recomputed anyway).
    out = _tail_core(num_hidden, dtype, row_block, interpret, x, agg, flat)
    return out, (x, agg, flat)


def _tail_core_bwd(num_hidden, dtype, row_block, interpret, res, g):
    x, agg, flat = res
    n, latent = x.shape
    hid = flat[0].shape[1]  # first-layer output width
    qb = min(row_block, _round_up(n, 8))
    xp, aggp, gp = (_pad_rows(a, qb) for a in (x, agg, g))
    num_tiles = xp.shape[0] // qb
    rows_h = _round_up(1 + num_hidden, 8)
    rows_l = 8
    kernel = _tail_bwd_kernel(
        num_hidden, dtype, x.dtype, agg.dtype, rows_h, rows_l
    )
    out_shapes = [
        jax.ShapeDtypeStruct((xp.shape[0], latent), x.dtype),  # dx
        jax.ShapeDtypeStruct((xp.shape[0], hid), agg.dtype),  # dagg
        jax.ShapeDtypeStruct((latent, hid), jnp.float32),  # dw0
    ]
    out_specs = [
        _row_spec(qb, latent),
        _row_spec(qb, hid),
        _acc_spec((latent, hid)),
    ]
    for i in range(num_hidden):
        w = flat[2 + 2 * i]
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(_acc_spec(w.shape))
    wf = flat[2 + 2 * num_hidden]
    out_shapes += [
        jax.ShapeDtypeStruct(wf.shape, jnp.float32),  # dwf
        jax.ShapeDtypeStruct((rows_h, hid), jnp.float32),  # acc_h
        jax.ShapeDtypeStruct((rows_l, latent), jnp.float32),  # acc_l
    ]
    out_specs += [
        _acc_spec(wf.shape),
        _acc_spec((rows_h, hid)),
        _acc_spec((rows_l, latent)),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            _row_spec(qb, latent),
            _row_spec(qb, hid),
            _row_spec(qb, latent),
        ]
        + [_const_spec(f) for f in flat],
        out_specs=out_specs,
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(xp, aggp, gp, *flat)
    dx, dagg, dw0 = outs[0][:n], outs[1][:n], outs[2]
    dwh = list(outs[3:3 + num_hidden])
    dwf, acc_h, acc_l = outs[3 + num_hidden:]
    dflat = [dw0, acc_h[0:1]]
    for i in range(num_hidden):
        dflat += [dwh[i], acc_h[i + 1:i + 2]]
    dflat += [dwf, acc_l[0:1], acc_l[1:2], acc_l[2:3]]
    return dx, dagg, tuple(dflat)


_tail_core.defvjp(_tail_core_fwd, _tail_core_bwd)


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

    Returns ``[N, L]`` in ``x.dtype``. Differentiable: gradients flow
    through a fused recompute-backward Pallas pass (``_tail_bwd_kernel``)
    to x, agg, and every node-MLP/LN parameter — training can enable
    ``fused_tail`` too (round 4; tests pin the grads against the unfused
    path).
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
    latent = x.shape[1]
    layers = node_params["layers"]
    w0 = layers[0]["w"][:latent]  # w_self half
    flat = [w0, layers[0]["b"]]
    for layer in layers[1:-1]:
        flat += [layer["w"], layer["b"]]
    flat += [layers[-1]["w"], layers[-1]["b"]]
    flat += [node_params["ln"]["scale"], node_params["ln"]["bias"]]
    # Biases / LN params ride as [1, H] rows (TPU needs >=2-D operands).
    # The slice/reshape happen OUTSIDE the custom_vjp core, so autodiff
    # maps the core's w_self gradient back into the full [2L, H] first
    # layer (whose w_agg half gets its gradient from the caller's z
    # projection).
    flat = tuple(f if f.ndim == 2 else f[None, :] for f in flat)
    return _tail_core(
        len(layers) - 2, jnp.dtype(dtype), row_block, interpret, x, agg,
        flat,
    )
