"""Write REAL-FORMAT tabular CSVs at study scale.

The synthetic fallback generators (data/tabular/datasets.py) return only
the modeling columns, so studies run through the fallback branch never
exercise the real-CSV loader semantics that tests/test_tabular_real_format
proved byte-exact (loan's ID drop, adult's '?'-row filter and dot-suffixed
labels, covtype's NaN drop). This module dresses the SAME synthetic
distributions in the real files' full column layout — extra columns,
ID column, '?' markers, '<=50K.' labels, NaN rows — so
``scripts/tabular_seeds.py --data_dir`` loads them through the real-CSV
branch of ``load_tabular``/``load_tabular_tvae`` end to end.

Scales match the reference splits: loan 5000 rows (train 4000 / test 1000,
loan_datasets.py:49), adult ~45k ('?' rows dropped by the loader; train
40000 / test rest, adult_datasets.py:53), covtype 12000 (test = first
2000, covtype_datasets.py:62,123).
"""
import os

import numpy as np

from cdgvae_tpu.data.tabular.datasets import (synthetic_adult,
                                              synthetic_covtype,
                                              synthetic_loan)


def loan_real_format(n=5000, seed=0):
    """Full kaggle Bank_Personal_Loan_Modelling.csv column set around the
    synthetic modeling columns; includes negative Experience rows like the
    real file."""
    import pandas as pd
    base = synthetic_loan(n, seed)
    rng = np.random.default_rng(seed + 1000)
    exp = base["Experience"].to_numpy().copy()
    exp[:30] = -rng.integers(1, 4, 30)  # the real file has negative rows
    return pd.DataFrame({
        "ID": base["ID"], "Age": base["Age"], "Experience": exp,
        "Income": base["Income"],
        "ZIP Code": rng.integers(90000, 96652, n),
        "Family": rng.integers(1, 5, n),
        "CCAvg": base["CCAvg"],
        "Education": rng.integers(1, 4, n),
        "Mortgage": base["Mortgage"],
        "Personal Loan": rng.integers(0, 2, n),
        "Securities Account": rng.integers(0, 2, n),
        "CD Account": rng.integers(0, 2, n),
        "Online": rng.integers(0, 2, n),
        "CreditCard": rng.integers(0, 2, n),
    })


def adult_real_format(n=46000, seed=0, q_frac=0.03, dot_frac=0.1):
    """Full UCI adult.csv column set; '?' markers sprinkled into
    workclass/occupation/native-country (the loader must drop those rows
    even though '?' sits outside the modeling columns) and a fraction of
    dot-suffixed '<=50K.'/'>50K.' labels (the UCI test-partition format)."""
    import pandas as pd
    base = synthetic_adult(n, seed)
    rng = np.random.default_rng(seed + 2000)
    workclass = rng.choice(["Private", "Self-emp-not-inc", "State-gov",
                            "Local-gov"], n).astype(object)
    occupation = rng.choice(["Tech-support", "Craft-repair", "Sales",
                             "Exec-managerial"], n).astype(object)
    country = rng.choice(["United-States", "Mexico", "Philippines"],
                         n).astype(object)
    for col in (workclass, occupation, country):
        col[rng.uniform(size=n) < q_frac / 3] = "?"
    income = base["income"].to_numpy().astype(object)
    dotted = rng.uniform(size=n) < dot_frac
    income[dotted] = np.char.add(income[dotted].astype(str), ".")
    return pd.DataFrame({
        "age": rng.integers(17, 90, n),
        "workclass": workclass,
        "fnlwgt": rng.integers(12285, 1484705, n),
        "education": rng.choice(["Bachelors", "HS-grad", "11th"], n),
        "educational-num": base["educational-num"],
        "marital-status": rng.choice(["Married-civ-spouse",
                                      "Never-married"], n),
        "occupation": occupation,
        "relationship": rng.choice(["Husband", "Not-in-family"], n),
        "race": rng.choice(["White", "Black"], n),
        "gender": rng.choice(["Male", "Female"], n),
        "capital-gain": base["capital-gain"],
        "capital-loss": base["capital-loss"],
        "hours-per-week": base["hours-per-week"],
        "native-country": country,
        "income": income,
    })


def covtype_real_format(n=12000, seed=0, nan_rows=20):
    """covtype.csv layout: terrain columns + Cover_Type plus some of the
    real file's extra columns, with NaNs in a modeling column (rows the
    loader must drop) and in a non-modeling column (rows it must keep)."""
    base = synthetic_covtype(n, seed)
    rng = np.random.default_rng(seed + 3000)
    base.insert(6, "Hillshade_9am",
                rng.integers(0, 254, n).astype(float))
    base.insert(7, "Hillshade_Noon",
                rng.integers(99, 254, n).astype(float))
    base["Soil_Type1"] = rng.integers(0, 2, n).astype(float)
    drop_idx = rng.choice(n, nan_rows, replace=False)
    base.loc[drop_idx[: nan_rows // 2], "Slope"] = np.nan   # row drops
    base.loc[drop_idx[nan_rows // 2:], "Hillshade_9am"] = np.nan  # kept
    return base


def write_corpus(data_dir: str, seed: int = 0,
                 datasets=("loan", "adult", "covtype")) -> str:
    """Reuse is keyed on the generation settings via a meta.json sidecar
    (like scripts/celeba_study.py's corpus), so a stale corpus written at
    a different seed — or a partial file from a crashed run — is
    regenerated instead of silently reused."""
    import json
    os.makedirs(data_dir, exist_ok=True)
    gens = {"loan": (loan_real_format, "Bank_Personal_Loan_Modelling.csv"),
            "adult": (adult_real_format, "adult.csv"),
            "covtype": (covtype_real_format, "covtype.csv")}
    meta_path = os.path.join(data_dir, "meta.json")
    for ds in datasets:
        gen, fname = gens[ds]
        path = os.path.join(data_dir, fname)
        meta = {}
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
            except (ValueError, OSError):
                meta = {}  # truncated sidecar from a crashed run: regenerate
        if meta.get(ds) == seed and os.path.exists(path):
            continue
        gen(seed=seed).to_csv(path, index=False)
        meta[ds] = seed
        with open(meta_path, "w") as f:
            json.dump(meta, f)
    return data_dir


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/tabular_fixture_corpus")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    print(write_corpus(args.data_dir, args.seed))
