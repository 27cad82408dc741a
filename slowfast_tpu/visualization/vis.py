"""Model visualization tool (reference tools/visualization.py:29-331).

Dumps model weights/activations to TensorBoard, runs Grad-CAM over val
batches, and visualizes wrong predictions.
"""

import numpy as np

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)


class GetWeightAndActivation:
    """Retrieve layer weights and activations
    (reference visualization/utils.py:158-252)."""

    def __init__(self, model, variables, layer_ls):
        self.model = model
        self.variables = variables
        self.layer_ls = [tuple(l.split("/")) for l in layer_ls]

    def get_weights(self):
        out = {}
        params = self.variables["params"]
        for path in self.layer_ls:
            node = params
            ok = True
            for k in path:
                if k not in node:
                    ok = False
                    break
                node = node[k]
            if ok:
                out["/".join(path)] = node
        return out

    def get_activations(self, inputs, bboxes=None):
        import flax.linen as nn

        acts = {}

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            path = tuple(context.module.path)
            if path in self.layer_ls:
                val = out[0] if isinstance(out, tuple) else out
                if isinstance(val, list):
                    val = val[0]
                acts["/".join(path)] = np.asarray(val)
            return out

        with nn.intercept_methods(interceptor):
            if bboxes is not None:
                preds = self.model.apply(self.variables, inputs, bboxes, train=False)
            else:
                preds = self.model.apply(self.variables, inputs, train=False)
        return acts, np.asarray(preds)


class WrongPredictionVis:
    """Track wrongly-predicted clips (reference prediction_vis.py:15-131)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.wrong_idx = []

    def update(self, preds, labels, indices):
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        pred_cls = preds.argmax(axis=-1)
        mask = pred_cls != labels
        self.wrong_idx.extend(np.asarray(indices)[mask].tolist())

    @property
    def wrong_class_prediction(self):
        return self.wrong_idx


def visualize(cfg):
    """Visualization entry (reference tools/visualization.py:243-331)."""
    import jax

    from slowfast_tpu.data import construct_loader
    from slowfast_tpu.engine.steps import create_train_state, make_eval_step
    from slowfast_tpu.models import build_model
    from slowfast_tpu.models.build import init_model
    from slowfast_tpu.parallel import mesh as mesh_lib
    from slowfast_tpu.solver.optimizer import construct_optimizer
    from slowfast_tpu.utils import checkpoint as cu
    from .tensorboard_vis import TensorboardWriter

    logging_utils.setup_logging(cfg.OUTPUT_DIR, mesh_lib.is_master_proc())
    if not (
        cfg.TENSORBOARD.MODEL_VIS.ENABLE or cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE
    ):
        return

    model = build_model(cfg)
    variables = init_model(model, cfg, rng=jax.random.PRNGKey(0), train=False)
    tx, _ = construct_optimizer(variables["params"], cfg, 1)
    state = create_train_state(cfg, model, tx, rng=jax.random.PRNGKey(0))
    state = cu.load_test_checkpoint(cfg, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    writer = TensorboardWriter(cfg)
    loader = construct_loader(cfg, "test")
    eval_fn = make_eval_step(cfg, model)

    if cfg.TENSORBOARD.MODEL_VIS.ENABLE and cfg.TENSORBOARD.MODEL_VIS.MODEL_WEIGHTS:
        gwa = GetWeightAndActivation(
            model, variables, cfg.TENSORBOARD.MODEL_VIS.LAYER_LIST
        )
        for name, w in gwa.get_weights().items():
            leaves = jax.tree.leaves(w)
            for i, leaf in enumerate(leaves):
                writer.writer.add_histogram(
                    f"weights/{name}/{i}", np.asarray(leaf), 0
                )

    wrong_vis = (
        WrongPredictionVis(cfg) if cfg.TENSORBOARD.WRONG_PRED_VIS.ENABLE else None
    )
    gradcam = None
    if (
        cfg.TENSORBOARD.MODEL_VIS.ENABLE
        and cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.ENABLE
        and cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.LAYER_LIST
    ):
        from .gradcam import GradCAM

        gradcam = GradCAM(
            model, variables, cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.LAYER_LIST,
            colormap=cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.COLORMAP,
        )

    import jax.numpy as jnp

    for cur_iter, (inputs, labels, index, times, meta) in enumerate(loader):
        jin = [jnp.asarray(x) for x in inputs]
        preds = eval_fn(state, {"inputs": jin, "labels": jnp.asarray(labels)})
        if wrong_vis is not None:
            wrong_vis.update(preds, labels, index)
        if (
            cfg.TENSORBOARD.MODEL_VIS.ENABLE
            and cfg.TENSORBOARD.MODEL_VIS.ACTIVATIONS
            and cur_iter == 0
        ):
            # Layer-activation heatmaps on the first batch (reference
            # tools/visualization.py:174, MODEL_VIS.ACTIVATIONS).
            gwa = GetWeightAndActivation(
                model, variables, cfg.TENSORBOARD.MODEL_VIS.LAYER_LIST
            )
            acts = gwa.get_activations(jin)
            writer.plot_weights_and_activations(activations=acts)
        if gradcam is not None and cur_iter == 0:
            cams, _ = gradcam(
                jin,
                labels=jnp.asarray(labels),
                # Target the TRUE class instead of the argmax prediction
                # (reference visualization.py:101).
                use_labels=cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.USE_TRUE_LABEL,
            )
            for p, cam in enumerate(cams):
                writer.writer.add_histogram(f"gradcam/pathway{p}", cam, 0)
        if cur_iter >= 10:
            break

    if wrong_vis is not None:
        logger.info(
            "Class indices with wrong predictions: %s",
            sorted(set(wrong_vis.wrong_class_prediction))[:50],
        )
    if cfg.TENSORBOARD.PREDICTIONS_PATH:
        # Plot previously-saved test predictions (the pickle written by
        # TEST.SAVE_RESULTS_PATH, engine/tester.py) — reference
        # tools/visualization.py:285-295.
        import pickle

        with open(cfg.TENSORBOARD.PREDICTIONS_PATH, "rb") as f:
            saved_preds, saved_labels = pickle.load(f)
        writer.plot_eval(np.asarray(saved_preds), np.asarray(saved_labels))
    writer.close()
