"""Pallas pooled-attention kernel parity (interpret mode, tiny shapes).

Real-TPU parity at production shapes is exercised by the benchmark; this
covers the math (forward + custom VJP, padding/masking, multi-head block
carving) against the XLA einsum path on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slowfast_tpu.ops.pallas_attention import pooled_attention


def _ref(qh, kh, vh):
    attn = jnp.einsum(
        "bqnc,bknc->bnqk", qh, kh, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
    return jnp.einsum(
        "bnqk,bknc->bqnc", attn, vh, preferred_element_type=jnp.float32
    ).astype(vh.dtype)


def test_forward_and_grad_parity():
    rng = jax.random.PRNGKey(0)
    # Deliberately non-aligned: Nq=70 (pads to 128), Nk=13, dq=24, dv=16.
    B, Nq, Nk, nh, dq, dv = 1, 70, 13, 2, 24, 16
    ks = jax.random.split(rng, 3)
    qh = jax.random.normal(ks[0], (B, Nq, nh, dq), jnp.float32) * 0.5
    kh = jax.random.normal(ks[1], (B, Nk, nh, dq), jnp.float32) * 0.5
    vh = jax.random.normal(ks[2], (B, Nk, nh, dv), jnp.float32)

    got = pooled_attention(qh, kh, vh, block_q=128, interpret=True)
    want = _ref(qh, kh, vh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )

    f1 = lambda q, k, v: jnp.sum(
        jnp.sin(pooled_attention(q, k, v, block_q=128, interpret=True))
    )
    f2 = lambda q, k, v: jnp.sum(jnp.sin(_ref(q, k, v)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(qh, kh, vh)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(qh, kh, vh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_fused_forward_and_grad_parity():
    """Round-3 aligned fused kernel (fused_pooled_attention) vs XLA."""
    from slowfast_tpu.ops.pallas_attention import fused_pooled_attention

    rng = jax.random.PRNGKey(1)
    # Nq NOT a multiple of block_q (exercises partial-tile masking, the
    # cls-token +1 case), Nk/dq/dv non-aligned.
    B, Nq, Nk, nh, dq, dv = 2, 131, 13, 2, 24, 16
    ks = jax.random.split(rng, 3)
    qh = jax.random.normal(ks[0], (B, Nq, nh, dq), jnp.float32) * 0.5
    kh = jax.random.normal(ks[1], (B, Nk, nh, dq), jnp.float32) * 0.5
    vh = jax.random.normal(ks[2], (B, Nk, nh, dv), jnp.float32)

    got = fused_pooled_attention(qh, kh, vh, block_q=128, interpret=True)
    want = _ref(qh, kh, vh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )

    f1 = lambda q, k, v: jnp.sum(
        jnp.sin(fused_pooled_attention(q, k, v, block_q=128, interpret=True))
    )
    f2 = lambda q, k, v: jnp.sum(jnp.sin(_ref(q, k, v)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(qh, kh, vh)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(qh, kh, vh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_attention_core_custom_vjp_matches_autodiff():
    """models/attention._attention_core (the XLA production core with the
    compute-dtype backward + flash-style delta trick) must match jax
    autodiff of plain softmax attention in fp32, where every cast is a
    no-op and the delta substitution <dp,p> = rowsum(do*out) is exact."""
    from slowfast_tpu.models.attention import _attention_core

    rng = jax.random.PRNGKey(1)
    B, Nq, Nk, nh, c = 2, 33, 9, 2, 8
    ks = jax.random.split(rng, 3)
    qh = jax.random.normal(ks[0], (B, Nq, nh, c), jnp.float32) * 0.7
    kh = jax.random.normal(ks[1], (B, Nk, nh, c), jnp.float32) * 0.7
    vh = jax.random.normal(ks[2], (B, Nk, nh, c), jnp.float32)

    got = _attention_core(qh, kh, vh)
    want = _ref(qh, kh, vh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )

    f1 = lambda q, k, v: jnp.sum(jnp.sin(_attention_core(q, k, v)))
    f2 = lambda q, k, v: jnp.sum(jnp.sin(_ref(q, k, v)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(qh, kh, vh)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(qh, kh, vh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_flash_forward_and_grad_parity():
    """True-flash kernel (flash_pooled_attention: no (Nq,Nk) residual,
    backward recomputes probabilities in VMEM) vs XLA."""
    from slowfast_tpu.ops.pallas_attention import flash_pooled_attention

    rng = jax.random.PRNGKey(2)
    # Nq NOT a multiple of block_q (partial-tile masking, cls +1 case),
    # Nk/dq/dv non-aligned.
    B, Nq, Nk, nh, dq, dv = 2, 131, 13, 2, 24, 16
    ks = jax.random.split(rng, 3)
    qh = jax.random.normal(ks[0], (B, Nq, nh, dq), jnp.float32) * 0.5
    kh = jax.random.normal(ks[1], (B, Nk, nh, dq), jnp.float32) * 0.5
    vh = jax.random.normal(ks[2], (B, Nk, nh, dv), jnp.float32)

    got = flash_pooled_attention(qh, kh, vh, block_q=128, interpret=True)
    want = _ref(qh, kh, vh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )

    f1 = lambda q, k, v: jnp.sum(
        jnp.sin(flash_pooled_attention(q, k, v, block_q=128, interpret=True))
    )
    f2 = lambda q, k, v: jnp.sum(jnp.sin(_ref(q, k, v)))
    g1 = jax.grad(f1, argnums=(0, 1, 2))(qh, kh, vh)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(qh, kh, vh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )
