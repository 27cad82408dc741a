"""Reversible MViT backbone (reference slowfast/models/reversible_mvit.py).

Round-1 placeholder: implemented in a later milestone with jax.custom_vjp
two-stream reversible blocks.
"""

from typing import Any

from flax import linen as nn


class ReversibleMViT(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x, thw, deterministic: bool = True):
        raise NotImplementedError("Rev-MViT lands in a later milestone")
