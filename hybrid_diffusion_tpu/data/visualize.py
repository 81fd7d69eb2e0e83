"""Dataset debug visualization.

Rebuilds the reference's `plot_images_from_dataloader` sanity helper
(utils/utils.py:475-508) for this pipeline: draw a grid of (degraded, GT)
pairs from a BatchLoader and save it to a file (headless hosts — no
`plt.show()`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_batch_grid(loader, num_images: int = 8,
                    out_path: str = "dataset_preview.png",
                    cols: int = 4) -> Optional[str]:
    """Save a preview grid of the first batch; returns the path.

    Rows alternate degraded / GT so each column is one aligned pair.
    Returns None (with a message) if matplotlib is unavailable.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover - matplotlib present in CI env
        print("[visualize] matplotlib unavailable; skipping preview")
        return None

    batch = next(iter(loader))
    inputs = np.asarray(batch["input"])[:num_images]
    gts = np.asarray(batch["gt"])[:num_images]
    n = inputs.shape[0]
    rows = 2 * ((n + cols - 1) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 1.5 * rows))
    axes = np.atleast_1d(axes).flatten()
    for i in range(n):
        block = (i // cols) * 2 * cols + (i % cols)
        for ax, img, tag in ((axes[block], inputs[i], "in"),
                             (axes[block + cols], gts[i], "gt")):
            ax.imshow(np.clip(img, 0, 255).astype(np.uint8))
            ax.set_title(f"{tag} {i}", fontsize=7)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path
