"""Model registry and builder (reference slowfast/models/build.py:13-81).

On TPU there is no DDP wrap: data parallelism comes from sharding the batch
over the mesh inside the jitted train step. ``build_model`` returns the flax
module; parameter initialization happens in the trainer via ``init_model``.
"""

import jax
import jax.numpy as jnp

from slowfast_tpu.utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")


def build_model(cfg):
    """Instantiate the registered model class for ``cfg.MODEL.MODEL_NAME``."""
    from slowfast_tpu.config.cfg_node import StaticCfg

    name = cfg.MODEL.MODEL_NAME
    model_cls = MODEL_REGISTRY.get(name)
    frozen = cfg.clone()
    frozen.freeze()
    return model_cls(cfg=StaticCfg(frozen))


def init_model(model, cfg, rng=None, train=True):
    """Initialize model variables with per-pathway dummy inputs.

    Returns the full variable dict {'params': ..., 'batch_stats': ...}.
    """
    if rng is None:
        rng = jax.random.PRNGKey(cfg.RNG_SEED)
    inputs = dummy_inputs(cfg, batch_size=2)
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    if cfg.DETECTION.ENABLE:
        boxes = jnp.array([[0, 0, 0, 32, 32], [1, 8, 8, 48, 48]], jnp.float32)
        variables = model.init(rngs, inputs, boxes, train=train)
    elif cfg.MASK.ENABLE and not cfg.MASK.MAE_ON:
        # MaskFeat takes a loader-granularity mask (reference passes the
        # collated mask into forward); init with a dummy at
        # AUG.MASK_WINDOW_SIZE so the module tree traces.
        t, h, w = cfg.AUG.MASK_WINDOW_SIZE
        mask = jnp.zeros((2, t, h, w), jnp.float32)
        variables = model.init(rngs, inputs, mask=mask, train=train)
    else:
        variables = model.init(rngs, inputs, train=train)
    return variables


def dummy_inputs(cfg, batch_size=2, crop_size=None):
    """Build the per-pathway dummy input list (reference misc.py:128-132)."""
    crop = crop_size or cfg.DATA.TRAIN_CROP_SIZE
    t = cfg.DATA.NUM_FRAMES
    chans = cfg.DATA.INPUT_CHANNEL_NUM
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        alpha = cfg.SLOWFAST.ALPHA
        return [
            jnp.zeros((batch_size, t // alpha, crop, crop, chans[0]), jnp.float32),
            jnp.zeros((batch_size, t, crop, crop, chans[1]), jnp.float32),
        ]
    return [jnp.zeros((batch_size, t, crop, crop, chans[0]), jnp.float32)]
