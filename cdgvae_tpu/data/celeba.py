"""CelebA(Mask-HQ) data pipeline.

* :func:`preprocess` — offline conversion of CelebAMask-HQ (images +
  part-segmentation PNGs + attribute annotations) into per-sample
  ``[H, W, 3+5]`` float npy files + 6-dim binary labels, replicating
  reference celeba/preprocess.py (RGB /255, 5 mask groups unioned per the
  causal structure's seg_map).
* :class:`CelebADataset` — loads the npy directory layout of the reference
  CelebALoader (celeba/datasets.py:14-54).
* :func:`synthetic_celeba` — schema-compatible synthetic faces (ellipse
  part masks + attribute-driven geometry) so the whole family runs offline
  without the real corpus. DEVIATION: used only when the npy directory is
  absent.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

SMILE_SEG_MAP = [
    ["skin"],                                          # High_Cheekbones
    ["mouth", "u_lip", "l_lip"],                       # Mouth_Slightly_Open
    ["skin", "nose", "neck", "neck_l"],                # Chubby
    ["l_brow", "r_brow", "l_eye", "r_eye", "eye_g"],   # Narrow_Eyes
    ["l_ear", "r_ear", "ear_r", "cloth", "hair", "hat"],  # etc
]
ATTRACTIVE_SEG_MAP = [
    ["l_eye", "r_eye", "eye_g"],                       # Bags_Under_Eyes
    ["skin", "nose", "neck", "neck_l"],                # Chubby
    ["l_brow", "r_brow", "l_eye", "r_eye", "eye_g", "u_lip", "l_lip"],
    ["hair", "hat"],                                   # Receding_Hairline
    ["mouth", "l_ear", "r_ear", "ear_r", "cloth", "hair", "hat"],
]


def preprocess(base_dir: str, out_dir: str, causal_structure: str = "smile",
               img_size: int = 128, train: bool = True):
    """CelebAMask-HQ -> npy files (reference celeba/preprocess.py)."""
    import cv2
    import pandas as pd

    nodes = (["Smiling", "Male", "High_Cheekbones", "Mouth_Slightly_Open",
              "Chubby", "Narrow_Eyes"] if causal_structure == "smile" else
             ["Young", "Male", "Bags_Under_Eyes", "Chubby", "Heavy_Makeup",
              "Receding_Hairline"])
    seg_map = (SMILE_SEG_MAP if causal_structure == "smile"
               else ATTRACTIVE_SEG_MAP)

    img_list = sorted(x for x in os.listdir(base_dir + "/CelebA-HQ-img")
                      if x != ".DS_Store")
    # Split selection (reference celeba/preprocess.py:20-26): keep only the
    # images whose list_eval_partition.txt partition is 0 (train) / 2 (test),
    # matching the reference's lstrip('0') filename normalization. Without
    # this filter train/ and test/ would both contain the ENTIRE corpus.
    part_file = os.path.join(base_dir, "list_eval_partition.txt")
    if os.path.exists(part_file):
        part = pd.read_csv(part_file, sep=" ", header=None)
        keep = set(x.lstrip("0")
                   for x in part[part[1] == (0 if train else 2)][0])
        img_list = [x for x in img_list if x in keep]
    else:
        # DEVIATION (documented): the partition file is absent from some
        # CelebAMask-HQ mirrors. Fall back to a deterministic 80/20 split by
        # image index so train and test are still disjoint.
        img_list = [x for x in img_list
                    if (int(x.split(".")[0]) % 5 == 4) != train]
    with open(base_dir + "/CelebAMask-HQ-attribute-anno.txt") as f:
        labels = f.readlines()
    df = pd.DataFrame([x.split() for x in labels[2:]],
                      columns=["file"] + labels[1].split())
    df_label = df[["file"] + nodes].copy()
    df_label[nodes] = df_label[nodes].astype(float).replace(-1, 0)
    # index once: per-image full-frame scans are O(n^2) over a 30k corpus
    label_by_file = df_label.set_index("file")

    tag = "train" if train else "test"
    img_out = os.path.join(out_dir, tag, causal_structure)
    lab_out = os.path.join(out_dir, tag, "label")
    os.makedirs(img_out, exist_ok=True)
    os.makedirs(lab_out, exist_ok=True)

    for fname in img_list:
        idx = int(fname.split(".")[0])
        img = cv2.imread(base_dir + "/CelebA-HQ-img/" + fname)
        img = cv2.resize(img, (img_size, img_size)) / 255.0
        img = img[:, :, ::-1]  # BGR -> RGB
        b = idx // 2000
        seg_imgs = []
        for seg in seg_map:
            files = [base_dir + f"/CelebAMask-HQ-mask-anno/{b}/"
                     f"{idx:05d}_{a}.png" for a in seg]
            parts = [cv2.resize(cv2.imread(f), (img_size, img_size))
                     for f in files if os.path.exists(f)]
            if parts:
                m = np.concatenate(parts, axis=-1).sum(axis=-1,
                                                       keepdims=True)
                m[m != 0] = 1
            else:
                m = np.zeros((img_size, img_size, 1))
            seg_imgs.append(m)
        concat = np.concatenate([img] + seg_imgs, axis=-1)
        y = np.array(label_by_file.loc[fname], dtype=np.float32)
        np.save(os.path.join(img_out, str(idx)), concat)
        np.save(os.path.join(lab_out, str(idx)), y)


def synthetic_celeba(n: int = 64, img_size: int = 128, seed: int = 0):
    """Synthetic face-like scenes: 6 binary attributes drive simple
    geometry; 5 part masks are the corresponding regions. Returns
    (x [n, S, S, 8], y [n, 6]).

    Every attribute is VISIBLE in pixels (a linear probe on raw pixels
    separates each one perfectly; asserted in test_celeba): Smiling lifts
    the mouth corners ~8 px and widens the mouth, High_Cheekbones paints
    raised rosy cheek patches, Male sets skin tone, Mouth_Slightly_Open
    sets mouth thickness, Chubby widens the face, Narrow_Eyes shrinks eye
    height."""
    rng = np.random.default_rng(seed)
    S = img_size
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float64) / S

    x_data = np.zeros((n, S, S, 8), dtype=np.float32)
    y_data = rng.integers(0, 2, (n, 6)).astype(np.float32)
    for i in range(n):
        smile, male, cheek, mouth, chubby, eyes = y_data[i]
        img = np.full((S, S, 3), 0.8)
        w = 0.30 + 0.08 * chubby
        face = ((xx - 0.5) ** 2 / w ** 2 + (yy - 0.5) ** 2 / 0.16) < 1
        skin_tone = np.array([0.9, 0.7, 0.6]) if male < 0.5 else \
            np.array([0.75, 0.55, 0.45])
        img[face] = skin_tone
        # cheek patches: raised + rosy with high cheekbones, else a faint
        # skin-tone shading at the lower position
        cy = 0.52 - 0.04 * cheek
        cr = 0.035 + 0.025 * cheek
        cheeks = ((((xx - 0.36) ** 2 + (yy - cy) ** 2) < cr ** 2)
                  | (((xx - 0.64) ** 2 + (yy - cy) ** 2) < cr ** 2)) & face
        img[cheeks] = (np.array([0.95, 0.45, 0.45]) if cheek > 0.5
                       else skin_tone * 0.94)
        eye_h = 0.012 + 0.02 * (1 - eyes)
        eye = (((np.abs(xx - 0.38) < 0.05) | (np.abs(xx - 0.62) < 0.05))
               & (np.abs(yy - 0.42) < eye_h))
        img[eye] = [0.1, 0.1, 0.15]
        # mouth: open-ness sets thickness; smiling lifts the corners with
        # a strong upward curve and widens the mouth
        mouth_h = 0.015 + 0.025 * mouth
        mw = 0.10 + 0.05 * smile
        curve = 0.06 * smile * (np.clip(
            np.cos((xx - 0.5) / mw * (np.pi / 2)), 0, None) - 0.5)
        mouth_m = (np.abs(xx - 0.5) < mw) & \
            (np.abs(yy - (0.70 + curve)) < mouth_h)
        img[mouth_m] = [0.7, 0.2, 0.2]
        hair = ((xx - 0.5) ** 2 / (w + 0.05) ** 2
                + (yy - 0.42) ** 2 / 0.2) < 1
        hair &= yy < 0.34
        img[hair] = [0.25, 0.15, 0.1]
        noise = rng.normal(0, 0.02, (S, S, 3))
        x_data[i, ..., :3] = np.clip(img + noise, 0, 1)
        # part masks: skin, mouth, skin+nose, eyes, etc
        x_data[i, ..., 3] = face.astype(np.float32)
        x_data[i, ..., 4] = mouth_m.astype(np.float32)
        x_data[i, ..., 5] = face.astype(np.float32)
        x_data[i, ..., 6] = eye.astype(np.float32)
        x_data[i, ..., 7] = hair.astype(np.float32)
    return x_data, y_data


@dataclass
class CelebADataset:
    """npy-directory dataset matching the reference CelebALoader contract;
    synthesizes data when the directory is absent."""
    data_dir: str = "./data"
    causal_structure: int = 0
    train: bool = True
    img_size: int = 128
    synthetic_n: int = 64
    seed: int = 0

    def __post_init__(self):
        self.nodes = (["Smiling", "Male", "High_Cheekbones",
                       "Mouth_Slightly_Open", "Chubby", "Narrow_Eyes"]
                      if self.causal_structure == 0 else
                      ["Young", "Male", "Bags_Under_Eyes", "Chubby",
                       "Heavy_Makeup", "Receding_Hairline"])
        sub = "smile" if self.causal_structure == 0 else "attractive"
        tag = "train" if self.train else "test"
        img_dir = os.path.join(self.data_dir, tag, sub)
        lab_dir = os.path.join(self.data_dir, tag, "label")
        if os.path.isdir(img_dir):
            files = sorted(x for x in os.listdir(img_dir)
                           if x.endswith(".npy"))
            xs, ys = [], []
            for f in files:
                idx = int(f.split(".")[0])
                xs.append(np.load(os.path.join(img_dir, f)))
                ys.append(np.load(os.path.join(lab_dir, f"{idx}.npy")))
            self.x_data = np.stack(xs).astype(np.float32)
            self.y_data = np.stack(ys).astype(np.float32)
        else:
            self.x_data, self.y_data = synthetic_celeba(
                self.synthetic_n, self.img_size,
                seed=self.seed + (0 if self.train else 1))

    def __len__(self):
        return len(self.x_data)
