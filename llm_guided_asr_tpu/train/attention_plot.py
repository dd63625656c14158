"""Attention-map extraction and plotting (calculate_all_attentions analog).

Rebuild of espnet2/main_funcs/calculate_all_attentions.py + trainer
plot_attention (trainer.py:870): run the model on one batch with flax's
``intermediates`` collection mutable (the MHA modules sow their softmax
weights), then save each [H, Tq, Tk] map as .npy and a matplotlib PNG.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def calculate_all_attentions(model, variables, *args, **kwargs) -> Dict[str, np.ndarray]:
    """Returns {module-path: weights [B, H, Tq, Tk]} for every attention."""
    out, mods = model.apply(
        variables, *args, deterministic=True, mutable=["intermediates"], **kwargs
    )

    flat: Dict[str, np.ndarray] = {}

    def rec(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(v, f"{path}/{k}" if path else k)
        elif isinstance(tree, (tuple, list)):
            if tree:
                flat[path.replace("/attn_weights", "")] = np.asarray(tree[0])
        else:
            flat[path] = np.asarray(tree)

    rec(mods.get("intermediates", {}), "")
    return flat


def plot_attentions(
    attentions: Dict[str, np.ndarray],
    output_dir,
    uid: str = "sample",
    max_maps: int = 8,
):
    """Save attention heatmaps as PNG + npy (trainer att_plot phase)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover
        logger.warning(f"matplotlib unavailable: {e}")
        plt = None
    for i, (name, w) in enumerate(sorted(attentions.items())):
        if i >= max_maps:
            break
        safe = name.replace("/", ".")
        arr = w[0]  # first batch element: [H, Tq, Tk]
        np.save(out / f"{uid}.{safe}.npy", arr)
        if plt is not None:
            h = arr.shape[0]
            fig, axes = plt.subplots(1, h, figsize=(3 * h, 3))
            if h == 1:
                axes = [axes]
            for j in range(h):
                axes[j].imshow(arr[j], aspect="auto", origin="lower")
                axes[j].set_title(f"head {j}")
            fig.suptitle(safe)
            fig.tight_layout()
            fig.savefig(out / f"{uid}.{safe}.png")
            plt.close(fig)
    logger.info(f"saved {min(len(attentions), max_maps)} attention plots -> {out}")
