"""Grad-CAM for flax video models (reference visualization/gradcam_utils.py).

The reference registers forward/backward hooks on a named layer. In JAX we
get the same quantities functionally: run once with capture_intermediates
to get the target activation A, then differentiate the class score with
respect to A by re-running the model with A substituted through an
intercept hook. The CAM is ReLU(sum_c dS/dA_c * A_c), normalized and
upsampled over the input clip.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from slowfast_tpu.utils import logging as logging_utils

logger = logging_utils.get_logger(__name__)


class GradCAM:
    def __init__(self, model, variables, target_layers, colormap="viridis"):
        """target_layers: list of module paths like 's5/pathway0_res2'."""
        self.model = model
        self.variables = variables
        self.target_layers = [tuple(t.split("/")) for t in target_layers]
        self.colormap = colormap

    def _run_with_substitution(self, inputs, layer_path, sub=None):
        """Forward pass; if sub is given, replace the layer output with it.

        Returns (preds, layer_output).
        """
        captured = {}

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            path = tuple(context.module.path)
            if path == layer_path:
                if sub is not None:
                    out = sub if not isinstance(out, tuple) else (sub,) + out[1:]
                captured["act"] = out[0] if isinstance(out, tuple) else out
            return out

        with nn.intercept_methods(interceptor):
            preds = self.model.apply(self.variables, inputs, train=False)
        return preds, captured.get("act")

    def __call__(self, inputs, labels=None, use_labels=False):
        """Returns (list of per-pathway CAMs at input resolution, preds)."""
        cams = []
        preds = None
        for p, layer_path in enumerate(self.target_layers):
            preds, act = self._run_with_substitution(inputs, layer_path)
            if act is None:
                raise ValueError(f"layer {layer_path} not found in forward")

            def score_fn(a):
                out, _ = self._run_with_substitution_static(
                    inputs, layer_path, a
                )
                out = out.astype(jnp.float32)
                if use_labels and labels is not None:
                    return jnp.sum(
                        jnp.take_along_axis(out, labels[:, None], axis=-1)
                    )
                return jnp.sum(jnp.max(out, axis=-1))

            grads = jax.grad(score_fn)(act)
            # Channel weights: spatial/temporal mean of gradients.
            axes = tuple(range(1, act.ndim - 1))
            weights = jnp.mean(grads, axis=axes, keepdims=True)
            cam = jnp.maximum(jnp.sum(weights * act, axis=-1), 0.0)
            cam = cam - cam.min()
            cam = cam / (cam.max() + 1e-8)
            # Upsample to the input pathway's (T, H, W).
            target_shape = inputs[min(p, len(inputs) - 1)].shape[1:4]
            cam = jax.image.resize(
                cam, (cam.shape[0],) + tuple(target_shape), method="trilinear"
            )
            cams.append(np.asarray(cam))
        return cams, np.asarray(preds)

    def _run_with_substitution_static(self, inputs, layer_path, sub):
        return self._run_with_substitution(inputs, layer_path, sub=sub), None


def overlay_heatmap(frames, cam, colormap="viridis", alpha=0.5):
    """Blend a (T, H, W) CAM onto uint8 (T, H, W, C) frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm

    mapper = cm.get_cmap(colormap)
    heat = mapper(np.asarray(cam))[..., :3]  # (T,H,W,3) in [0,1]
    blended = (1 - alpha) * frames.astype(np.float32) / 255.0 + alpha * heat
    return (blended * 255).astype(np.uint8)
