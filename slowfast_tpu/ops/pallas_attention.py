"""Pallas TPU kernel for MViT pooled attention.

Reference hot path: slowfast/models/attention.py:150-392 computes
softmax(q k^T) v with the KEY/VALUE sequence POOLED — Nk is small
(hundreds) while Nq can be tens of thousands. The XLA path materializes
the (B, nh, Nq, Nk) logits + probabilities in HBM in fp32 (forward AND
saved for backward): several GB of traffic per MViTv2-S step.

This kernel exploits the pooled-K structure: a full K/V row block fits in
VMEM, so each grid step loads one q tile, computes its EXACT row softmax
in registers/VMEM (no online-softmax rescaling needed), and writes only
the (bq, dv) output — the (Nq, Nk) matrix never exists in HBM. The
backward pass recomputes probabilities per tile and accumulates dk/dv
across the sequential TPU grid.

Layout: tokens stay (B, N, heads*dim) end to end (the flat layout of
models/attention.py); the per-head slice is carved by the BlockSpec index
map — no head-major transpose/copy anywhere.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, nk_real):
    q = q_ref[0]  # (bq, dq)
    k = k_ref[0]  # (Nk_pad, dq)
    v = v_ref[0]  # (Nk_pad, dv)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    mask = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) < nk_real
    logits = jnp.where(mask, logits, -1e30)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / s).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                nk_real):
    j = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    mask = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) < nk_real
    logits = jnp.where(mask, logits, -1e30)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s  # (bq, Nk_pad)

    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, Nk_pad)
    # softmax VJP: dlogits = p * (dp - sum(dp * p))
    dl = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))

    dq = jax.lax.dot_general(
        dl.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk = jax.lax.dot_general(
        dl.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Nk_pad, dq)
    dv = jax.lax.dot_general(
        p.astype(do_ref.dtype), do.astype(do_ref.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (Nk_pad, dv)

    # dk/dv revisit the same output block for every q tile j of one (b, h):
    # the TPU grid is sequential, so initialize at j==0 then accumulate.
    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk.astype(dk_ref.dtype)
    dv_ref[0] += dv.astype(dv_ref.dtype)


def _specs(bq, dq, dv, nk_pad, nh):
    """BlockSpecs carving (B, N, nh*dim) tokens per (b, h, j) grid step."""
    q_spec = pl.BlockSpec((1, bq, dq), lambda b, h, j: (b, j, h))
    k_spec = pl.BlockSpec((1, nk_pad, dq), lambda b, h, j: (b, 0, h))
    v_spec = pl.BlockSpec((1, nk_pad, dv), lambda b, h, j: (b, 0, h))
    o_spec = pl.BlockSpec((1, bq, dv), lambda b, h, j: (b, j, h))
    return q_spec, k_spec, v_spec, o_spec


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def _attention(q, k, v, nh, nk_real, bq, interpret):
    out, _ = _attention_fwd(q, k, v, nh, nk_real, bq, interpret)
    return out


def _attention_fwd(q, k, v, nh, nk_real, bq, interpret):
    B, Nq, DQ = q.shape
    _, Nk, DV = v.shape
    dq, dv = DQ // nh, DV // nh
    grid = (B, nh, Nq // bq)
    q_spec, k_spec, v_spec, o_spec = _specs(bq, dq, dv, Nk, nh)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nk_real=nk_real),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, DV), v.dtype),
        interpret=interpret,
    )(q, k, v)
    return out, (q, k, v)


def _attention_bwd(nh, nk_real, bq, interpret, res, do):
    q, k, v = res
    B, Nq, DQ = q.shape
    _, Nk, DV = v.shape
    dq_d, dv_d = DQ // nh, DV // nh
    grid = (B, nh, Nq // bq)
    q_spec, k_spec, v_spec, o_spec = _specs(bq, dq_d, dv_d, Nk, nh)
    # dk/dv accumulate across all q tiles: keep them fp32 in the kernel
    # regardless of the compute dtype (bf16 accumulation over ~50 tiles
    # loses bits) and cast back at the boundary.
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, nk_real=nk_real),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, o_spec],
        out_specs=[q_spec, k_spec, v_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention.defvjp(_attention_fwd, _attention_bwd)


def pooled_attention(qh, kh, vh, block_q=512, interpret=None):
    """softmax(q k^T) v for flat-layout heads, without materializing the
    (Nq, Nk) matrix in HBM.

    qh: (B, Nq, nh, dq) — pre-scaled, rel-pos-augmented query.
    kh: (B, Nk, nh, dq); vh: (B, Nk, nh, dv). Returns (B, Nq, nh, dv).

    Pads Nq to the q-tile, Nk/dq/dv to the 128-lane boundary (pad keys are
    masked to -inf inside the kernel; pad channels are zero and drop out
    of the contractions), runs the kernel, slices the padding back off.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Nq, nh, dq = qh.shape
    Nk = kh.shape[1]
    dv = vh.shape[-1]

    dq_p = dq + (-dq) % LANES
    dv_p = dv + (-dv) % LANES
    nk_p = Nk + (-Nk) % LANES
    # Scoped VMEM is ~16MB: the backward tile holds several (bq, nk_p)
    # fp32 intermediates plus K/V blocks, so shrink the q tile as the
    # pooled-K length grows (bq * nk_p fp32 <= ~2MB per intermediate).
    fit = ((2 << 20) // (4 * nk_p)) // LANES * LANES
    bq = max(LANES, min(block_q, fit))
    bq = min(bq, Nq + (-Nq) % LANES)
    nq_p = Nq + (-Nq) % bq

    q = _pad_to(_pad_to(qh, 3, LANES), 1, bq).reshape(B, nq_p, nh * dq_p)
    k = _pad_to(_pad_to(kh, 3, LANES), 1, LANES).reshape(B, nk_p, nh * dq_p)
    v = _pad_to(_pad_to(vh, 3, LANES), 1, LANES).reshape(B, nk_p, nh * dv_p)

    out = _attention(q, k, v, nh, Nk, bq, interpret)
    out = out.reshape(B, nq_p, nh, dv_p)[:, :Nq, :, :dv]
    return out


def use_pallas(cfg):
    """Config gate: Pallas attention on the TPU backend (interpret mode on
    CPU is orders of magnitude slower than the einsum path, so tests and
    CPU runs keep XLA unless the flag is forced)."""
    mode = cfg.TPU.PALLAS_ATTENTION
    if mode == "force":
        return True
    return bool(mode) and jax.default_backend() == "tpu"
