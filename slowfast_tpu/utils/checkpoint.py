"""Checkpointing: native save/resume + PyTorch Model-Zoo import.

Reference: slowfast/utils/checkpoint.py:61-660. Native checkpoints keep the
reference's directory layout and naming (``OUTPUT_DIR/checkpoints/
checkpoint_epoch_%05d.pyth``) so auto-resume scans work identically; the
payload is flax-serialized msgpack instead of a torch pickle.

The importer loads reference ``.pyth`` checkpoints (torch pickles) and maps
them onto the flax parameter tree: name mapping is near-mechanical because
modules keep the reference's names; weights transpose OITHW->THWIO (convs)
and OI->IO (linears); BN weight/bias/running_mean/running_var map to
scale/bias + batch_stats. 2D->3D inflation (reference inflate_weight
:148-178) is applied when temporal extents differ.
"""

import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from . import logging as logging_utils

logger = logging_utils.get_logger(__name__)


# ---------------------------------------------------------------------------
# Native checkpoints
# ---------------------------------------------------------------------------

def get_checkpoint_dir(path_to_job):
    return os.path.join(path_to_job, "checkpoints")


def get_path_to_checkpoint(path_to_job, epoch, task=""):
    name = f"{task}_checkpoint_epoch_{epoch:05d}.pyth" if task else (
        f"checkpoint_epoch_{epoch:05d}.pyth"
    )
    return os.path.join(get_checkpoint_dir(path_to_job), name)


def get_last_checkpoint(path_to_job, task=""):
    """Most recent checkpoint file (reference checkpoint.py:61-78)."""
    d = get_checkpoint_dir(path_to_job)
    names = os.listdir(d) if os.path.exists(d) else []
    prefix = f"{task}_checkpoint" if task else "checkpoint"
    names = [f for f in names if f.startswith(prefix)]
    if not names:
        return None
    return os.path.join(d, sorted(names)[-1])


def has_checkpoint(path_to_job, task=""):
    return get_last_checkpoint(path_to_job, task) is not None


def is_checkpoint_epoch(cfg, cur_epoch, multigrid_schedule=None):
    """Checkpoint cadence, multigrid-aware (reference checkpoint.py:92-110)."""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max(
                    (s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1
                )
                # End-anchored so the epoch just before a long-cycle shape
                # change is always checkpointed (reference checkpoint.py:105).
                return (s[-1] - 1 - cur_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0


def save_checkpoint(path_to_job, state, epoch, cfg, scaler_state=None):
    """Persist a TrainState (reference save_checkpoint :113-145).

    Master-process only; payload is msgpack for the pytrees + pickled
    metadata.
    """
    if jax.process_index() != 0:
        return None
    os.makedirs(get_checkpoint_dir(path_to_job), exist_ok=True)
    # Pull to host as numpy.
    host_state = jax.device_get(state)
    payload = {
        "epoch": epoch,
        "model_state": serialization.to_bytes(
            {"params": host_state.params, "batch_stats": host_state.batch_stats}
        ),
        "optimizer_state": serialization.to_bytes(host_state.opt_state),
        "step": int(host_state.step),
        "cfg": cfg.dump(),
        "format": "slowfast_tpu.msgpack.v1",
    }
    # SSL runs carry extra functional state (momentum-encoder EMA params,
    # queues, memory banks) that must survive a resume (reference restores
    # the full module state dict, train_net.py:532-543).
    if getattr(host_state, "ssl_state", None) is not None:
        payload["ssl_state"] = serialization.to_bytes(host_state.ssl_state)
    path = get_path_to_checkpoint(path_to_job, epoch + 1, cfg.TASK)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def load_native_checkpoint(path, state, load_opt=True):
    """Restore a TrainState template from a native checkpoint file.

    ``load_opt=False`` restores only model weights/stats (fine-tune init with
    CHECKPOINT_EPOCH_RESET: the optimizer state and step counter stay fresh
    so the LR schedule restarts, reference checkpoint.py:506-521).
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert payload.get("format", "").startswith("slowfast_tpu."), (
        f"{path} is not a native checkpoint; use load_torch_checkpoint"
    )
    model = serialization.from_bytes(
        {"params": state.params, "batch_stats": state.batch_stats},
        payload["model_state"],
    )
    new_state = state.replace(
        params=model["params"],
        batch_stats=model["batch_stats"],
    )
    if load_opt:
        opt_state = serialization.from_bytes(
            state.opt_state, payload["optimizer_state"]
        )
        new_state = new_state.replace(
            opt_state=opt_state, step=np.asarray(payload["step"], np.int32)
        )
    if (
        payload.get("ssl_state") is not None
        and getattr(state, "ssl_state", None) is not None
    ):
        new_state = new_state.replace(
            ssl_state=serialization.from_bytes(
                state.ssl_state, payload["ssl_state"]
            )
        )
    return new_state, payload["epoch"]


# ---------------------------------------------------------------------------
# PyTorch .pyth import
# ---------------------------------------------------------------------------

def _torch_name_to_flax_path(name: str):
    """Map a reference module path to (collection, flax key path)."""
    name = re.sub(r"^module\.", "", name)
    # blocks.5.xxx -> blocks_5.xxx (MViT); predictors/projection handled as-is
    name = re.sub(r"\bblocks\.(\d+)\.", r"blocks_\1.", name)
    name = re.sub(r"\blayers\.(\d+)\.", r"layers_\1.", name)
    name = re.sub(r"\bprojection\.(\d+)\.", r"projection_\1.", name)
    parts = name.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    if leaf == "weight":
        return "params", mods, "kernel_or_scale"
    if leaf == "bias":
        return "params", mods, "bias"
    if leaf == "running_mean":
        return "batch_stats", mods, "mean"
    if leaf == "running_var":
        return "batch_stats", mods, "var"
    if leaf in ("cls_token", "mask_token") or leaf.startswith(("pos_embed", "rel_pos")):
        # parameter attributes (not submodules)
        return "params", mods, leaf
    if leaf == "num_batches_tracked":
        return None, None, None
    return "params", mods, leaf


def inflate_weight(w2d: np.ndarray, t: int) -> np.ndarray:
    """2D->3D kernel inflation: tile over T and divide by T
    (reference checkpoint.py:148-178). w2d is THWIO with T==1."""
    return np.repeat(w2d, t, axis=0) / float(t)


def load_torch_checkpoint(path, variables, inflate=False, strict=False):
    """Load a reference .pyth checkpoint into a flax variables dict.

    Returns (new_variables, missing, unexpected).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    return load_torch_checkpoint_dict(sd, variables, inflate=inflate, strict=strict)


def load_torch_checkpoint_dict(sd, variables, inflate=False, strict=False):
    """Map a torch-style state dict (name -> tensor/ndarray) onto flax vars."""
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    flat = {"params": _flatten(params), "batch_stats": _flatten(stats)}

    matched, missing, unexpected = set(), [], []
    for tname, tval in sd.items():
        col, mods, leaf = _torch_name_to_flax_path(tname)
        if col is None:
            continue
        val = tval.numpy() if hasattr(tval, "numpy") else np.asarray(tval)
        candidates = _candidate_keys(mods, leaf)
        hit = None
        for key in candidates:
            if key in flat[col]:
                hit = key
                break
        if hit is None:
            unexpected.append(tname)
            continue
        target = flat[col][hit]
        val = _convert_weight(val, target.shape, inflate, is_kernel=hit[-1] == "kernel")
        if val is None:
            unexpected.append(f"{tname} (shape mismatch)")
            continue
        flat[col][hit] = val.astype(target.dtype)
        matched.add((col, hit))

    for col in ("params", "batch_stats"):
        for key in flat[col]:
            if (col, key) not in matched:
                missing.append(f"{col}:{'/'.join(key)}")

    new_vars = {
        "params": _unflatten(flat["params"], params),
        "batch_stats": _unflatten(flat["batch_stats"], stats),
    }
    if missing:
        logger.info("Not loaded from checkpoint: %d leaves", len(missing))
    if unexpected:
        logger.info("Unused checkpoint entries: %d", len(unexpected))
    if strict and (missing or unexpected):
        raise ValueError(f"strict load failed: missing={missing[:5]} unexpected={unexpected[:5]}")
    return new_vars, missing, unexpected


def _candidate_keys(mods, leaf):
    mods = tuple(mods)
    if leaf == "kernel_or_scale":
        return [mods + ("kernel",), mods + ("scale",)]
    return [mods + (leaf,), tuple(mods[:-1]) + (mods[-1] + "_" + leaf,) if mods else (leaf,)]


def _convert_weight(val, target_shape, inflate, is_kernel=True):
    """Transpose torch layouts to flax and optionally inflate 2D->3D.

    ``is_kernel`` distinguishes conv/linear weights (which always transpose,
    including square matrices) from direct-copy tables (rel_pos, pos_embed,
    LN scales).
    """
    ts = tuple(target_shape)
    if not is_kernel:
        return val if val.shape == ts else None
    # Conv3d: torch (O, I, t, h, w) -> flax (t, h, w, I, O)
    if val.ndim == 5:
        cand = val.transpose(2, 3, 4, 1, 0)
        if cand.shape == ts:
            return cand
    # Conv2d: torch (O, I, h, w) -> flax (h, w, I, O) or inflate to (t,h,w,I,O)
    if val.ndim == 4:
        cand = val.transpose(2, 3, 1, 0)
        if cand.shape == ts:
            return cand
        if len(ts) == 5 and inflate:
            cand = inflate_weight(val.transpose(2, 3, 1, 0)[None], ts[0])
            if cand.shape == ts:
                return cand
    # Linear: torch (O, I) -> flax (I, O)
    if val.ndim == 2:
        cand = val.T
        if cand.shape == ts:
            return cand
    if val.ndim == 1 and val.shape == ts:
        return val
    # pos-embed length mismatch etc. handled by surgery elsewhere
    return None


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat, template):
    out = jax.tree_util.tree_map(lambda x: x, template)  # deep copy structure

    def setpath(d, path, val):
        for k in path[:-1]:
            d = d[k]
        d[path[-1]] = val

    out = _to_mutable(out)
    for path, val in flat.items():
        setpath(out, path, val)
    return out


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def load_test_checkpoint(cfg, state):
    """Checkpoint selection for testing (reference checkpoint.py:625-660)."""
    if cfg.TEST.CHECKPOINT_FILE_PATH:
        path = cfg.TEST.CHECKPOINT_FILE_PATH
    elif has_checkpoint(cfg.OUTPUT_DIR, cfg.TASK):
        path = get_last_checkpoint(cfg.OUTPUT_DIR, cfg.TASK)
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        path = cfg.TRAIN.CHECKPOINT_FILE_PATH
    else:
        logger.info("Testing with random initialization. Only for debugging.")
        return state
    return _load_any(path, state, cfg)


def load_train_checkpoint(cfg, state):
    """Auto-resume or explicit init (reference train_net.py:532-574).

    Returns (state, start_epoch).
    """
    if cfg.TRAIN.AUTO_RESUME and has_checkpoint(cfg.OUTPUT_DIR, cfg.TASK):
        path = get_last_checkpoint(cfg.OUTPUT_DIR, cfg.TASK)
        state, epoch = load_native_checkpoint(path, state)
        # The saved epoch is the last COMPLETED epoch; resume at the next
        # one (reference train_net.py:540: start_epoch = checkpoint_epoch+1).
        return state, epoch + 1
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        path = cfg.TRAIN.CHECKPOINT_FILE_PATH
        if _is_native(path):
            reset = cfg.TRAIN.CHECKPOINT_EPOCH_RESET
            state, epoch = load_native_checkpoint(path, state, load_opt=not reset)
            return state, 0 if reset else epoch + 1
        state = _load_any(path, state, cfg)
    return state, 0


def _is_native(path):
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        return isinstance(payload, dict) and str(
            payload.get("format", "")
        ).startswith("slowfast_tpu.")
    except Exception:
        return False


def _load_any(path, state, cfg):
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"\x80\x04" or head == b"\x80\x02":  # python pickle
        try:
            new_state, _ = load_native_checkpoint(path, state)
            return new_state
        except AssertionError:
            pass
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ckpt_type = cfg.TEST.CHECKPOINT_TYPE if not cfg.TRAIN.ENABLE else (
        cfg.TRAIN.CHECKPOINT_TYPE
    )
    if ckpt_type == "caffe2":
        from .c2_import import load_caffe2_checkpoint

        new_vars, _, _ = load_caffe2_checkpoint(
            path, variables, inflate=cfg.TRAIN.CHECKPOINT_INFLATE
        )
    else:
        new_vars, _, _ = load_torch_checkpoint(
            path, variables, inflate=cfg.TRAIN.CHECKPOINT_INFLATE
        )
    return state.replace(
        params=new_vars["params"], batch_stats=new_vars["batch_stats"]
    )
