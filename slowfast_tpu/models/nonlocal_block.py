"""Non-local block (reference slowfast/models/nonlocal_helper.py:10-144).

Computes self-attention over all T*H*W positions of an NTHWC feature map:
theta/phi/g 1x1x1 projections, affinity matmul (MXU), softmax or
dot-product normalization, output projection with a zero-init BN, residual.
Optional THW max-pooling on phi/g to shrink the key/value set.
"""

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import conv3d, max_pool3d


class Nonlocal(nn.Module):
    dim: int
    dim_inner: int
    pool_size: Optional[Sequence[int]] = None  # (T, H, W) or None
    instantiation: str = "softmax"
    zero_init_final_norm: bool = True
    norm: Callable = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, H, W, C = x.shape
        use_pool = self.pool_size is not None and any(s > 1 for s in self.pool_size)

        theta = conv3d(self.dim_inner, (1, 1, 1), bias=True, dtype=self.dtype, name="conv_theta")(x)
        kv_in = x
        if use_pool:
            kv_in = max_pool3d(x, self.pool_size, self.pool_size)
        phi = conv3d(self.dim_inner, (1, 1, 1), bias=True, dtype=self.dtype, name="conv_phi")(kv_in)
        g = conv3d(self.dim_inner, (1, 1, 1), bias=True, dtype=self.dtype, name="conv_g")(kv_in)

        n_q = T * H * W
        theta = theta.reshape(B, n_q, self.dim_inner)
        phi = phi.reshape(B, -1, self.dim_inner)
        g = g.reshape(B, -1, self.dim_inner)

        # (B, n_q, n_kv) affinity on the MXU.
        aff = jnp.einsum(
            "bqc,bkc->bqk", theta, phi, preferred_element_type=jnp.float32
        )
        if self.instantiation == "softmax":
            aff = aff * (self.dim_inner ** -0.5)
            aff = nn.softmax(aff, axis=2)
        elif self.instantiation == "dot_product":
            aff = aff / aff.shape[2]
        else:
            raise NotImplementedError(
                f"Unknown non-local instantiation {self.instantiation}"
            )

        out = jnp.einsum(
            "bqk,bkc->bqc", aff.astype(g.dtype), g, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(B, T, H, W, self.dim_inner)
        out = conv3d(self.dim, (1, 1, 1), bias=True, dtype=self.dtype, name="conv_out")(out)
        out = self.norm(self.dim, zero_init_gamma=self.zero_init_final_norm, name="bn")(
            out, train=train
        )
        return x + out
