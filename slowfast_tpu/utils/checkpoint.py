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
from .io import pathmgr

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
    names = pathmgr.ls(d) if pathmgr.exists(d) else []
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


_writer_thread = None
_writer_error = None


def wait_for_saves():
    """Block until a pending background checkpoint write completes.

    Re-raises any exception the writer thread hit (disk full, permissions)
    so a failed save can never masquerade as success — the synchronous
    path raises to the caller, and this keeps that contract.
    """
    global _writer_thread, _writer_error
    if _writer_thread is not None:
        _writer_thread.join()
        _writer_thread = None
    if _writer_error is not None:
        err, _writer_error = _writer_error, None
        raise err


def save_checkpoint(
    path_to_job, state, epoch, cfg, scaler_state=None, background=False
):
    """Persist a TrainState (reference save_checkpoint :113-145).

    Master-process only; payload is msgpack for the pytrees + pickled
    metadata. The write is ATOMIC (tmp + os.replace): a crash mid-write
    never leaves a truncated file for auto-resume to trip over.

    ``background=True`` (the trainer's epoch loop) returns as soon as the
    device→host copy is done and serializes + writes on a writer thread —
    the numpy snapshot is immutable, so training (including buffer
    donation of the device state) proceeds while the disk write runs.
    Call :func:`wait_for_saves` before process exit / reading the file;
    it re-raises writer failures. A previous write failure also surfaces
    here, at the next save.
    """
    if jax.process_index() != 0:
        return None
    pathmgr.mkdirs(get_checkpoint_dir(path_to_job))
    # Join (and surface errors from) any previous writer BEFORE snapshotting
    # so at most one host-state copy exists at a time.
    wait_for_saves()
    # Pull to host as numpy — must complete before the next step donates
    # the device buffers; only serialization + disk IO are backgrounded.
    host_state = jax.device_get(state)
    path = get_path_to_checkpoint(path_to_job, epoch + 1, cfg.TASK)
    cfg_dump = cfg.dump()
    task = cfg.TASK

    def write():
        payload = {
            "epoch": epoch,
            "model_state": serialization.to_bytes(
                {
                    "params": host_state.params,
                    "batch_stats": host_state.batch_stats,
                }
            ),
            "optimizer_state": serialization.to_bytes(host_state.opt_state),
            "step": int(host_state.step),
            "cfg": cfg_dump,
            "format": "slowfast_tpu.msgpack.v1",
        }
        # SSL runs carry extra functional state (momentum-encoder EMA
        # params, queues, memory banks) that must survive a resume
        # (reference restores the full state dict, train_net.py:532-543).
        if getattr(host_state, "ssl_state", None) is not None:
            payload["ssl_state"] = serialization.to_bytes(host_state.ssl_state)
        # Dot-prefixed tmp name: invisible to get_last_checkpoint's
        # "{task}_checkpoint"/"checkpoint" prefix scan until the rename.
        tmp = os.path.join(
            os.path.dirname(path), "." + os.path.basename(path) + ".tmp"
        )
        with pathmgr.open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        pathmgr.replace(tmp, path)

    if background:
        import threading

        def guarded_write():
            global _writer_error
            try:
                write()
            except BaseException as e:  # surfaced by wait_for_saves()
                _writer_error = e

        global _writer_thread
        _writer_thread = threading.Thread(
            target=guarded_write, name=f"ckpt-write-{task}-{epoch}",
            daemon=False,
        )
        _writer_thread.start()
    else:
        write()
    return path


def load_native_checkpoint(path, state, load_opt=True, clear_name_pattern=()):
    """Restore a TrainState template from a native checkpoint file.

    ``load_opt=False`` restores only model weights/stats (fine-tune init with
    CHECKPOINT_EPOCH_RESET: the optimizer state and step counter stay fresh
    so the LR schedule restarts, reference checkpoint.py:506-521). In this
    mode the load is PARTIAL-MATCH like the reference's ``strict=False``
    ``pre_train_dict_match`` filter (reference checkpoint.py:380-430): only
    keys present in both trees with matching shapes are copied, so a
    MaskFeat/MAE pretrain checkpoint initializes the fine-tune MViT trunk
    while the fresh classifier head and the checkpoint's decoder/pred heads
    are skipped. 1-D ``rel_pos_*`` length mismatches are linearly
    re-interpolated (reference :443-451).
    """
    with pathmgr.open(path, "rb") as f:
        payload = pickle.load(f)
    assert payload.get("format", "").startswith("slowfast_tpu."), (
        f"{path} is not a native checkpoint; use load_torch_checkpoint"
    )
    template = {"params": state.params, "batch_stats": state.batch_stats}
    if clear_name_pattern:
        # Renamed keys can never strict-match the saved tree: go through
        # the partial-restore filter (reference applies the pattern before
        # its strict=False load, checkpoint.py:298-310).
        raw = _apply_clear_names(
            serialization.msgpack_restore(payload["model_state"]),
            clear_name_pattern,
        )
        model = _partial_restore(template, raw)
        load_opt = False
    elif load_opt:
        # Resume: the trees must match exactly.
        model = serialization.from_bytes(template, payload["model_state"])
    else:
        model = _partial_restore(
            template, serialization.msgpack_restore(payload["model_state"])
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
        # Key-tolerant restore: load every bank/queue the checkpoint has,
        # keep the template init for keys it predates (e.g. knn_memory was
        # added after round-2 checkpoints were written).
        raw = serialization.msgpack_restore(payload["ssl_state"])
        ssl_state = dict(state.ssl_state)
        for key, template in state.ssl_state.items():
            if key in raw:
                restored = serialization.from_state_dict(template, raw[key])
                # Leaf shapes must match the template: memory banks are
                # sized to the dataset (trainer auto-resizes
                # CONTRASTIVE.LENGTH), and a stale-sized bank would be
                # silently mis-indexed by jit's clamped OOB gathers.
                t_shapes = [
                    np.shape(x) for x in jax.tree_util.tree_leaves(template)
                ]
                r_shapes = [
                    np.shape(x) for x in jax.tree_util.tree_leaves(restored)
                ]
                if t_shapes != r_shapes:
                    logger.warning(
                        "checkpoint ssl_state[%r] shapes %s do not match "
                        "the current run's %s (dataset size changed?); "
                        "keeping fresh init",
                        key,
                        r_shapes[:4],
                        t_shapes[:4],
                    )
                    continue
                ssl_state[key] = restored
            else:
                logger.warning(
                    "checkpoint ssl_state has no %r; keeping fresh init", key
                )
        new_state = new_state.replace(ssl_state=ssl_state)
    return new_state, payload["epoch"]


def _apply_clear_names(raw, patterns):
    """Strip name patterns (e.g. ``"backbone."``) from every checkpoint key
    (reference checkpoint.py:298-310, TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN).
    Used for transfer: an SSL checkpoint stores the trunk under
    ``backbone.``; the fine-tune model has no such prefix."""
    if not patterns:
        return raw
    flat = _flatten(raw)
    nested = {}
    for path, val in flat.items():
        name = ".".join(path)
        for p in patterns:
            if p in name:
                name = name.replace(p, "")
        d = nested
        parts = name.split(".")
        for k in parts[:-1]:
            d = d.setdefault(k, {})
        d[parts[-1]] = val
    return nested


def _partial_restore(template, raw):
    """Copy every checkpoint leaf whose path exists in ``template`` with a
    matching shape; keep the template init elsewhere. Mirrors the
    reference's fine-tune filter (checkpoint.py:380-430)."""
    tflat = _flatten(_to_mutable(template))
    rflat = _flatten(raw)
    loaded, skipped = [], []
    for path, tval in tflat.items():
        if path not in rflat:
            continue
        val = np.asarray(rflat[path])
        tshape = tuple(np.asarray(tval).shape)
        if val.shape == tshape:
            tflat[path] = val
            loaded.append(path)
        elif (
            path[-1].startswith("rel_pos")
            and val.ndim == 2
            and val.shape[1] == tshape[1]
        ):
            tflat[path] = _interp_linear(val, tshape[0])
            loaded.append(path)
        else:
            skipped.append((path, val.shape, tshape))
    unexpected = [p for p in rflat if p not in tflat]
    missing = [p for p in tflat if p not in rflat]
    logger.info(
        "partial restore: %d loaded, %d shape-skipped, %d missing (fresh "
        "init), %d unexpected (dropped)",
        len(loaded), len(skipped), len(missing), len(unexpected),
    )
    for p, got, want in skipped:
        logger.warning("shape mismatch %s: ckpt %s vs model %s", ".".join(p), got, want)
    return _unflatten(tflat, _to_mutable(template))


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
    # MSSeparateHead (masked models): transforms.{i}.{j} / projections.{i}
    name = re.sub(
        r"\bpred_head\.transforms\.(\d+)\.(\d+)\.", r"pred_head.transforms_\1_\2.", name
    )
    name = re.sub(
        r"\bpred_head\.projections\.(\d+)\.", r"pred_head.projections_\1.", name
    )
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
    if leaf in ("cls_token", "mask_token") or leaf.startswith(
        ("pos_embed", "rel_pos", "decoder_pos_embed", "dec_pos_embed")
    ):
        # parameter attributes (not submodules)
        return "params", mods, leaf
    if leaf == "num_batches_tracked":
        return None, None, None
    return "params", mods, leaf


def inflate_weight(w2d: np.ndarray, t: int) -> np.ndarray:
    """2D->3D kernel inflation: tile over T and divide by T
    (reference checkpoint.py:148-178). w2d is THWIO with T==1."""
    return np.repeat(w2d, t, axis=0) / float(t)


def load_torch_checkpoint(path, variables, inflate=False, strict=False,
                          image_init=False, clear_name_pattern=()):
    """Load a reference .pyth checkpoint into a flax variables dict.

    Returns (new_variables, missing, unexpected).
    """
    import torch

    with pathmgr.open(path, "rb") as f:
        ckpt = torch.load(f, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    return load_torch_checkpoint_dict(
        sd, variables, inflate=inflate, strict=strict, image_init=image_init,
        clear_name_pattern=clear_name_pattern,
    )


def _interp_linear(v, n):
    """torch F.interpolate(mode='linear') over the leading token axis of an
    (L, C) table — exact reference semantics (checkpoint.py:443-451)."""
    import torch

    t = torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
    out = torch.nn.functional.interpolate(
        t.t().unsqueeze(0), size=n, mode="linear"
    )
    return out[0].t().numpy()


def _interp_bicubic_2d(v, hw):
    """Bicubic resize of a (1, H*W, C) pos-embed grid to hw*hw tokens
    (reference checkpoint.py:470-487)."""
    import math
    import torch

    src = int(math.sqrt(v.shape[1]))
    assert src * src == v.shape[1], "pos_embed_spatial is not square"
    t = torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
    t = t.reshape(1, src, src, -1).permute(0, 3, 1, 2)
    t = torch.nn.functional.interpolate(t, size=(hw, hw), mode="bicubic")
    return t.reshape(1, -1, hw * hw).permute(0, 2, 1).numpy()


def _surgery_convert(tname, val, ts):
    """Shape-mismatch surgery for pos-embeds/rel-pos tables (reference
    checkpoint.py:435-490; runs regardless of image_init). ``val`` is in
    torch layout (these tables carry no layout transpose). Returns the
    converted array or None."""
    ts = tuple(ts)
    if "rel_pos" in tname and val.ndim == 2 and len(ts) == 2 and val.shape[1] == ts[1]:
        return _interp_linear(val, ts[0])
    if "pos_embed_temporal" in tname and val.ndim == 3 and len(ts) == 3 and (
        val.shape[2] == ts[2]
    ):
        return _interp_linear(val[0], ts[1])[None]
    if "pos_embed_spatial" in tname and val.ndim == 3 and len(ts) == 3 and (
        val.shape[2] == ts[2]
    ):
        return _interp_bicubic_2d(val, int(round(np.sqrt(ts[1]))))
    return None


def _image_init_surgery(sd, flat_params):
    """Image->video init surgery on the torch state dict BEFORE mapping
    (reference checkpoint.py:315-433, gated by TRAIN.CHECKPOINT_IN_INIT):

    * joint pos_embed <-> separated (class + spatial) split/merge;
    * patch_embed 2D->3D inflation by plain temporal repeat (no /T);
    * pool_q/k/v depthwise conv temporal repeat.
    The returned dict is a shallow copy with surgically-edited entries.
    """
    sd = dict(sd)

    def target_shape(*names):
        for name in names:
            col, mods, leaf = _torch_name_to_flax_path(name)
            for key in _candidate_keys(mods, leaf):
                if key in flat_params:
                    return flat_params[key].shape
        return None

    # joint -> separated split (reference :316-334 pos_embed_xy variant;
    # here the separated layout is pos_embed_class + pos_embed_spatial).
    sp_shape = target_shape("pos_embed_spatial")
    if "pos_embed" in sd and sp_shape is not None and target_shape("pos_embed") is None:
        pe = np.asarray(sd["pos_embed"])
        if pe.shape[1] == sp_shape[1] + 1:
            sd["pos_embed_class"] = pe[:, :1]
            sd["pos_embed_spatial"] = pe[:, 1:]
            sd.pop("pos_embed")
    # separated -> joint merge (reference :369-394 video->image deflation).
    joint_shape = target_shape("pos_embed")
    if (
        "pos_embed_spatial" in sd
        and joint_shape is not None
        and target_shape("pos_embed_spatial") is None
    ):
        pe = np.asarray(sd["pos_embed_spatial"])
        if "pos_embed_class" in sd and pe.shape[1] + 1 == joint_shape[1]:
            pe = np.concatenate([np.asarray(sd["pos_embed_class"]), pe], axis=1)
            sd.pop("pos_embed_class")
        if pe.shape == tuple(joint_shape):
            sd["pos_embed"] = pe
            sd.pop("pos_embed_spatial")

    # patch_embed / pool_{q,k,v} temporal inflation by plain repeat
    # (reference :336-357 and :397-412 — NO /T scaling, unlike CNN
    # inflation).
    for tname in list(sd.keys()):
        if not tname.endswith(".weight"):
            continue
        if not (
            "patch_embed.proj" in tname
            or any(p in tname for p in ("pool_q", "pool_k", "pool_v"))
        ):
            continue
        ts = target_shape(tname)
        if ts is None or len(ts) != 5:
            continue
        val = np.asarray(sd[tname])
        t = ts[0]  # flax layout (T, H, W, I, O)
        if val.ndim == 4:  # torch (O, I, h, w) -> repeat to (O, I, t, h, w)
            sd[tname] = np.repeat(val[:, :, None], t, axis=2)
        elif val.ndim == 5 and val.shape[2] == 1 and t > 1:
            sd[tname] = np.repeat(val, t, axis=2)
        elif val.ndim == 5 and len(ts) == 4:  # video -> image: temporal sum
            sd[tname] = val.sum(2)
    return sd


def load_torch_checkpoint_dict(sd, variables, inflate=False, strict=False,
                               image_init=False, clear_name_pattern=()):
    """Map a torch-style state dict (name -> tensor/ndarray) onto flax vars."""
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    flat = {"params": _flatten(params), "batch_stats": _flatten(stats)}

    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in sd.items()
    }
    if clear_name_pattern:
        # Strip transfer prefixes from the checkpoint names (reference
        # checkpoint.py:298-310), e.g. "backbone." for SSL -> fine-tune.
        renamed = {}
        for k, v in sd.items():
            for p in clear_name_pattern:
                if p in k:
                    k = k.replace(p, "")
            renamed[k] = v
        sd = renamed
    if image_init:
        sd = _image_init_surgery(sd, flat["params"])

    matched, missing, unexpected = set(), [], []
    for tname, val in sd.items():
        col, mods, leaf = _torch_name_to_flax_path(tname)
        if col is None:
            continue
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
        conv = _convert_weight(
            val, target.shape, inflate, is_kernel=hit[-1] == "kernel"
        )
        if conv is None:
            conv = _surgery_convert(tname, val, target.shape)
        if conv is None:
            unexpected.append(f"{tname} (shape mismatch)")
            continue
        flat[col][hit] = conv.astype(target.dtype)
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
            state, epoch = load_native_checkpoint(
                path, state, load_opt=not reset,
                clear_name_pattern=tuple(
                    cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN
                ),
            )
            return state, 0 if reset else epoch + 1
        state = _load_any(path, state, cfg)
    return state, 0


def _is_native(path):
    try:
        with pathmgr.open(path, "rb") as f:
            payload = pickle.load(f)
        return isinstance(payload, dict) and str(
            payload.get("format", "")
        ).startswith("slowfast_tpu.")
    except Exception:
        return False


def _load_any(path, state, cfg):
    # Both test and train loads honor the TRAIN pattern, as the reference
    # does (checkpoint.py:676,690).
    clear = tuple(cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN)
    with pathmgr.open(path, "rb") as f:
        head = f.read(2)
    if head == b"\x80\x04" or head == b"\x80\x02":  # python pickle
        try:
            new_state, _ = load_native_checkpoint(
                path, state, clear_name_pattern=clear
            )
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
            path,
            variables,
            inflate=cfg.TRAIN.CHECKPOINT_INFLATE,
            image_init=getattr(cfg.TRAIN, "CHECKPOINT_IN_INIT", False),
            clear_name_pattern=clear,
        )
    return state.replace(
        params=new_vars["params"], batch_stats=new_vars["batch_stats"]
    )
