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
    elif cfg.MASK.ENABLE and not (cfg.MASK.MAE_ON and cfg.MASK.MAE_RND_MASK):
        # MaskFeat (and loader-masked MAE) take a loader-granularity mask
        # (reference passes the collated mask into forward); init with a
        # dummy at the loader's mask geometry so the module tree traces.
        if cfg.MVIT.PATCH_2D:
            from slowfast_tpu.models.mvit import maskfeat_feature_size

            fh = maskfeat_feature_size(cfg)
            mask = jnp.zeros((2, fh, fh), jnp.float32)
        else:
            t, h, w = cfg.AUG.MASK_WINDOW_SIZE
            mask = jnp.zeros((2, t, h, w), jnp.float32)
        variables = model.init(rngs, inputs, mask=mask, train=train)
    else:
        variables = model.init(rngs, inputs, train=train)
    if cfg.MASK.ENABLE and cfg.MASK.SCALE_INIT_BY_DEPTH:
        variables = _scale_init_by_depth(variables)
    return variables


def _scale_init_by_depth(variables):
    """Rescale residual-branch output projections by 1/sqrt(2*layer_id)
    (reference masked.py fix_init_weight :149-163: trunk ``blocks`` attn
    proj + mlp fc2; decoder blocks continue attn layer ids past the trunk
    while fc2 restarts at 1)."""
    import re

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    n_trunk = sum(
        1 for k in params if re.fullmatch(r"blocks_\d+", k)
    )

    def rescale(block, layer_id, attn_layer_id):
        if "attn" in block and "proj" in block["attn"]:
            p = block["attn"]["proj"]
            p["kernel"] = p["kernel"] / jnp.sqrt(2.0 * attn_layer_id)
        if "mlp" in block and "fc2" in block["mlp"]:
            p = block["mlp"]["fc2"]
            p["kernel"] = p["kernel"] / jnp.sqrt(2.0 * layer_id)

    for k in params:
        m = re.fullmatch(r"blocks_(\d+)", k)
        if m:
            i = int(m.group(1)) + 1
            rescale(params[k], i, i)
    head = params.get("pred_head")
    if head:
        for k in head:
            m = re.fullmatch(r"transforms_(\d+)_(\d+)", k)
            if m and "attn" in head[k]:
                j = int(m.group(2)) + 1
                rescale(head[k], j, j + n_trunk)
    return {**variables, "params": params}


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
