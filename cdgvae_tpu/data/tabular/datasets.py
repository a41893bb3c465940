"""Tabular datasets: Personal Loan, Adult, Forest CoverType.

Replicates the reference dataset pipelines (tabular/modules/{loan,adult,
covtype}_datasets.py): fixed-seed shuffle, column selection, z-scoring,
digit-interleaved ground-truth labels per causal-chain component, and the
CTGAN-style DataTransformer encoding for CDG-TVAE.

The reference expects user-downloaded CSVs (loan_datasets.py:39 etc.). When
the CSV is absent, :func:`load_tabular` falls back to a schema-compatible
synthetic generator whose columns follow the assumed causal topology, so
every downstream path (training, PC/SHD, ML efficacy) runs end-to-end
offline. Pass ``data_dir`` with the real CSVs for exact-data parity.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd


def interleave_float(a: float, b: float) -> float:
    """Digit-interleave two floats in [0,1) into one float — the bijective
    label construction the chain topologies depend on. The float op ORDER
    below is the parity contract with the reference's digit loop
    (loan_datasets.py:15-30): each decimal digit is peeled with *=10 // 1
    %=1 and deposited at the next place value, alternating operands, so the
    accumulated float64 representation error matches bit for bit."""
    out, place = 0.0, 1.0
    while a != 0 or b != 0:
        place /= 10
        a *= 10
        out += place * (a // 1)
        a %= 1
        place /= 10
        b *= 10
        out += place * (b // 1)
        b %= 1
    return out


def interleave_pairs(arr: np.ndarray) -> np.ndarray:
    """Interleave each row's 2 columns -> [n, 1]."""
    return np.array([[interleave_float(x, y)] for x, y in arr])


DATASET_SPECS = {
    "loan": dict(
        csv="Bank_Personal_Loan_Modelling.csv",
        shuffle_state=1,
        continuous=["CCAvg", "Mortgage", "Income", "Experience", "Age"],
        topology=[["Mortgage", "Income"], ["Experience", "Age"], ["CCAvg"]],
        tvae_order=["Mortgage", "Income", "Experience", "Age", "CCAvg"],
        train_slice=(None, 4000), test_slice=(4000, None),
        zscore_exclude=[], discrete=[],
        node=3, factor=[1, 1, 1], input_dim=5, mask=[2, 2, 1],
        target="CCAvg", task="regression",
    ),
    "adult": dict(
        csv="adult.csv",
        shuffle_state=1,
        continuous=["income", "educational-num", "capital-gain",
                    "capital-loss", "hours-per-week"],
        topology=[["capital-gain"], ["capital-loss"],
                  ["income", "educational-num", "hours-per-week"]],
        tvae_order=None,  # flatten_topology
        train_slice=(None, 40000), test_slice=(40000, None),
        zscore_exclude=["income"], discrete=["income"],
        node=3, factor=[1, 1, 1], input_dim=5, mask=[1, 1, 3],
        target="income", task="classification",
        tvae_rows=4000,
    ),
    "covtype": dict(
        csv="covtype.csv",
        shuffle_state=5,
        continuous=["Horizontal_Distance_To_Hydrology",
                    "Vertical_Distance_To_Hydrology",
                    "Horizontal_Distance_To_Roadways",
                    "Horizontal_Distance_To_Fire_Points",
                    "Elevation", "Aspect", "Slope", "Cover_Type"],
        topology=[["Horizontal_Distance_To_Hydrology"],
                  ["Vertical_Distance_To_Hydrology"],
                  ["Horizontal_Distance_To_Roadways",
                   "Horizontal_Distance_To_Fire_Points"],
                  ["Elevation"], ["Aspect"], ["Slope", "Cover_Type"]],
        tvae_order=None,
        train_slice=(2000, None), test_slice=(None, 2000),
        zscore_exclude=["Cover_Type"], discrete=["Cover_Type"],
        node=6, factor=[1, 1, 1, 1, 1, 1], input_dim=8,
        mask=[1, 1, 2, 1, 1, 1 + 7],
        target="Cover_Type", task="classification",
    ),
}


# ---------------------------------------------------------------------------
# Synthetic fallbacks (schema-compatible; causal structure per the topology)
# ---------------------------------------------------------------------------

def synthetic_loan(n: int = 5000, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    age = rng.integers(23, 68, n).astype(float)
    experience = np.clip(age - 23 - rng.integers(0, 4, n), 0, None)
    income = np.clip(rng.lognormal(4.0, 0.5, n), 8, 224).round()
    mortgage = np.where(rng.uniform(size=n) < 0.7, 0.0,
                        income * rng.uniform(0.8, 3.0, n)).round()
    ccavg = np.clip(0.02 * income + 0.01 * (age - 45)
                    + rng.normal(0, 0.8, n), 0, 10).round(2)
    return pd.DataFrame({
        "ID": np.arange(1, n + 1), "Age": age, "Experience": experience,
        "Income": income, "Mortgage": mortgage, "CCAvg": ccavg,
    })


def synthetic_adult(n: int = 45000, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    edu = rng.integers(1, 17, n).astype(float)
    gain = np.where(rng.uniform(size=n) < 0.88, 0.0,
                    rng.lognormal(8.0, 1.0, n)).round().clip(0, 99999)
    loss = np.where(rng.uniform(size=n) < 0.95, 0.0,
                    rng.lognormal(7.3, 0.4, n)).round()
    hours = np.clip(rng.normal(40 + 0.5 * np.log1p(gain), 10, n),
                    1, 99).round()
    logit = -4.5 + 0.25 * edu + 0.0004 * gain + 0.0005 * loss \
        + 0.03 * (hours - 40)
    income = np.where(rng.uniform(size=n) < 1 / (1 + np.exp(-logit)),
                      ">50K", "<=50K")
    return pd.DataFrame({
        "educational-num": edu, "capital-gain": gain, "capital-loss": loss,
        "hours-per-week": hours, "income": income,
    })


def synthetic_covtype(n: int = 12000, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    elevation = rng.normal(2950, 280, n).round()
    slope = np.clip(rng.normal(14, 7, n), 0, 60).round()
    aspect = rng.uniform(0, 360, n).round()
    hdh = np.clip(rng.normal(270 + 0.05 * (elevation - 2950), 200, n),
                  0, None).round()
    vdh = (0.15 * hdh + rng.normal(0, 40, n)).round()
    hdr = np.clip(rng.normal(2350 + 0.8 * (elevation - 2950), 1500, n),
                  0, None).round()
    hdf = np.clip(0.5 * hdr + rng.normal(1500, 800, n), 0, None).round()
    ct_logit = (elevation - 2950) / 280 + slope / 30 + rng.normal(0, 1, n)
    cover = np.clip(np.digitize(ct_logit, [-1.5, -0.7, 0, 0.7, 1.5, 2.2])
                    + 1, 1, 7).astype(float)
    return pd.DataFrame({
        "Elevation": elevation, "Aspect": aspect, "Slope": slope,
        "Horizontal_Distance_To_Hydrology": hdh,
        "Vertical_Distance_To_Hydrology": vdh,
        "Horizontal_Distance_To_Roadways": hdr,
        "Horizontal_Distance_To_Fire_Points": hdf,
        "Cover_Type": cover,
    })


_SYNTHETIC = {"loan": synthetic_loan, "adult": synthetic_adult,
              "covtype": synthetic_covtype}


def load_raw(dataset: str, data_dir: str | None = None,
             synthetic_n: int | None = None) -> pd.DataFrame:
    spec = DATASET_SPECS[dataset]
    if data_dir:
        path = os.path.join(data_dir, spec["csv"])
        if os.path.exists(path):
            return pd.read_csv(path)
    gen = _SYNTHETIC[dataset]
    return gen(synthetic_n) if synthetic_n else gen()


def _prepare(df: pd.DataFrame, dataset: str) -> pd.DataFrame:
    """Shuffle + dataset-specific cleaning (loan_datasets.py:39-41,
    adult_datasets.py:39-42, covtype_datasets.py:35-36,57)."""
    spec = DATASET_SPECS[dataset]
    df = df.sample(frac=1, random_state=spec["shuffle_state"]).reset_index(
        drop=True)
    if dataset == "loan":
        df = df.drop(columns=["ID"], errors="ignore")
    elif dataset == "adult":
        df = df[(df == "?").sum(axis=1) == 0]
        df = df.copy()
        df["income"] = df["income"].map(
            {"<=50K": 0, ">50K": 1, "<=50K.": 0, ">50K.": 1})
    df = df[spec["continuous"]].dropna(axis=0)
    return df


def _bijection_labels(df01: pd.DataFrame, topology) -> np.ndarray:
    """Ground-truth chain labels by digit interleaving each topology group
    of the (0,1)-normalized columns (loan_datasets.py:55-65; 3-way nesting
    for adult, adult_datasets.py:59-73)."""
    parts = []
    for group in topology:
        block = df01[group].to_numpy()
        if len(group) == 1:
            parts.append(block)
        elif len(group) == 2:
            parts.append(interleave_pairs(block))
        elif len(group) == 3:
            first = interleave_pairs(block[:, :2])
            parts.append(interleave_pairs(
                np.concatenate([first, block[:, [2]]], axis=1)))
        else:
            raise ValueError("topology groups of size <=3 supported")
    # DEVIATION (stability): the reference's interleave_float overflows past
    # 1 for max-valued rows (interleave(1.0, 1.0) = 1.1; 3-way nesting up to
    # ~1.19). Targets > 1 make the alignment BCE unbounded BELOW
    # (-(1-y)·log(1-σ) rewards σ→1 without limit), which measurably diverges
    # training on heavy-tailed data (adult). Clamp to [0, 1]: only the
    # handful of max rows change, and the loss is bounded again.
    return np.clip(np.concatenate(parts, axis=1), 0.0, 1.0)


def _slice(arr, sl):
    return arr[slice(*sl)]


@dataclass
class TabularData:
    """A loaded tabular split: z-scored features + interleaved labels.
    Mirrors the reference TabularDataset/TestTabularDataset contract."""
    x_data: np.ndarray        # [n, input_dim] z-scored, original column order
    label: np.ndarray         # [n, node]
    frame: pd.DataFrame       # z-scored frame (for PC / ML-efficacy)
    continuous: list
    topology: list
    flatten_topology: list    # column indices in topology order


def load_tabular(dataset: str, train: bool = True,
                 data_dir: str | None = None,
                 synthetic_n: int | None = None) -> TabularData:
    spec = DATASET_SPECS[dataset]
    df = _prepare(load_raw(dataset, data_dir, synthetic_n), dataset)

    scaling = [c for c in spec["continuous"]
               if c not in spec["zscore_exclude"]]
    df_ = df.copy()
    df_[scaling] = (df[scaling] - df[scaling].mean(axis=0)) / \
        df[scaling].std(axis=0)

    df01 = (df_ - df_.min(axis=0)) / (df_.max(axis=0) - df_.min(axis=0))
    labels = _bijection_labels(df01, spec["topology"])

    sl = spec["train_slice"] if train else spec["test_slice"]
    frame = df_.iloc[slice(*sl)]
    flat = [spec["continuous"].index(c)
            for grp in spec["topology"] for c in grp]
    return TabularData(
        x_data=frame.to_numpy().astype(np.float32),
        label=_slice(labels, sl).astype(np.float32),
        frame=frame,
        continuous=list(spec["continuous"]),
        topology=[list(g) for g in spec["topology"]],
        flatten_topology=flat,
    )


@dataclass
class TabularTVAEData:
    """DataTransformer-encoded split for CDG-TVAE (reference
    TabularDataset2)."""
    x_data: np.ndarray
    label: np.ndarray
    transformer: object
    raw: pd.DataFrame
    continuous: list
    topology: list


def load_tabular_tvae(dataset: str, data_dir: str | None = None,
                      random_state: int = 0,
                      synthetic_n: int | None = None) -> TabularTVAEData:
    from .transformer import DataTransformer

    spec = DATASET_SPECS[dataset]
    df = _prepare(load_raw(dataset, data_dir, synthetic_n), dataset)

    df01 = (df - df.min(axis=0)) / (df.max(axis=0) - df.min(axis=0))
    labels = _bijection_labels(df01, spec["topology"])

    order = spec["tvae_order"] or [c for grp in spec["topology"]
                                   for c in grp]
    sl = spec["train_slice"]
    if spec.get("tvae_rows"):  # adult fits the transformer on 4000 rows
        sl = (sl[0], spec["tvae_rows"])
    raw = df[order].iloc[slice(*sl)]
    labels = _slice(labels, sl)

    transformer = DataTransformer()
    transformer.fit(raw, discrete_columns=spec["discrete"],
                    random_state=random_state)
    x = transformer.transform(raw)
    n = min(len(x), len(labels))
    return TabularTVAEData(
        x_data=x[:n].astype(np.float32),
        label=labels[:n].astype(np.float32),
        transformer=transformer, raw=raw,
        continuous=list(spec["continuous"]),
        topology=[list(g) for g in spec["topology"]],
    )
