"""On-disk PNG dataset interchange with the reference format.

The reference's data generators write one PNG per sample into
``causal_data/<name>/{train,test}/`` with the LABELS ENCODED IN THE
FILENAME — ``a_<f1>_<f2>_..._<fk>.png`` with every field rounded to 4
decimals (modules/pendulum_real.py:88,110-113; modules/pendulum.py:63,85-89;
DR/modules/pendulum_DR.py:167-168,201-202) — and the datasets parse them
back out with ``x[:-4].split('_')[1:]`` (modules/datasets.py:30).

This module makes the TPU framework interoperable with that on-disk format
in both directions:

* :func:`save_png_dataset` — export a device-rendered dataset to the
  reference's exact tree layout + filename scheme, so reference scripts can
  consume our data.
* :func:`load_png_dataset` — load any reference-generated PNG tree
  (pendulum / pendulum_real / pendulum_DR), replicating the reference's
  resize + ``(x-127.5)/127.5`` normalization, so this framework can train
  directly on datasets a reference user already has on disk.

Deviation (documented): the reference iterates ``os.listdir`` order, which
is filesystem-dependent; we sort filenames so runs are reproducible. Order
only matters for the semi-supervised ``labeled_ratio`` truncation.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["save_png_dataset", "load_png_dataset", "sample_filename"]


def sample_filename(fields) -> str:
    """Reference filename for one sample: ``a_<f1>_..._<fk>.png`` with
    4-decimal rounding (pendulum_real.py:88)."""
    return "a_" + "_".join(str(round(float(v), 4)) for v in fields) + ".png"


def _to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float HWC -> uint8, inverse of the loader's (x-127.5)/127.5."""
    return np.clip(np.rint(img * 127.5 + 127.5), 0, 255).astype(np.uint8)


def save_png_dataset(root: str, factors: np.ndarray, is_test: np.ndarray,
                     image_size: int = 96, background_col: int | None = None,
                     chunk: int = 2048) -> tuple[int, int]:
    """Render ``factors`` on device and write the reference PNG tree.

    ``factors``: [n, k] label matrix; columns 0:4 are the physical factors
    (light, angle, length, position) fed to the renderer, every column is
    encoded into the filename. ``background_col`` names the DR family's
    spurious background column (DR/modules/pendulum_DR.py:164).
    ``image_size=96`` matches the reference's 1.0-inch × 96-dpi savefig.

    Returns (n_train, n_test) written.
    """
    from PIL import Image
    import jax.numpy as jnp

    from ..ops.renderer import render

    factors = np.asarray(factors, dtype=np.float64)
    is_test = np.asarray(is_test, dtype=bool)
    train_dir = os.path.join(root, "train")
    test_dir = os.path.join(root, "test")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)

    counts = [0, 0]
    for i in range(0, len(factors), chunk):
        f = factors[i:i + chunk]
        bg = (jnp.asarray(f[:, background_col], jnp.float32)
              if background_col is not None else None)
        imgs = np.asarray(render(jnp.asarray(f[:, :4], jnp.float32),
                                 size=image_size, background=bg))
        for j in range(len(f)):
            test = bool(is_test[i + j])
            out = test_dir if test else train_dir
            Image.fromarray(_to_uint8(imgs[j])).save(
                os.path.join(out, sample_filename(f[j])))
            counts[test] += 1
    return counts[0], counts[1]


def load_png_dataset(split_dir: str, image_size: int = 64
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Load one ``{train,test}`` directory of reference-format PNGs.

    Replicates modules/datasets.py:24-30: PIL resize to
    (image_size, image_size), keep RGB, normalize ``(x-127.5)/127.5``;
    labels parsed from filenames. Returns (x [n,H,W,3] float32 in [-1,1],
    labels [n,k] float64).
    """
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    names = sorted(f for f in os.listdir(split_dir) if f.endswith("png"))
    if not names:
        raise FileNotFoundError(f"no .png files in {split_dir}")

    def _load(fname):
        img = Image.open(os.path.join(split_dir, fname)).resize(
            (image_size, image_size))
        return np.asarray(img)[:, :, :3]

    # PIL's decode releases the GIL: threads give a near-linear speedup on
    # the reference-scale 10k-file trees (the reference loads serially with
    # a tqdm loop, modules/datasets.py:24 — its startup takes minutes)
    with ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 8)) as ex:
        xs = list(ex.map(_load, names))
    labels = [[float(v) for v in n[:-4].split("_")[1:]] for n in names]
    x = (np.asarray(xs, dtype=np.float32) - 127.5) / 127.5
    return x, np.asarray(labels, dtype=np.float64)
