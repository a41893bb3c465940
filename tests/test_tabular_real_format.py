"""Real-format CSV parity for the tabular loaders.

Round 1 only ever exercised the synthetic fallbacks; this suite proves the
real-CSV branch of ``load_tabular``/``load_tabular_tvae`` reproduces the
reference loader semantics exactly on hand-crafted real-format excerpts:

- loan: the ID column drop, full-frame fixed-seed shuffle, all-column
  z-scoring (/root/reference/tabular/modules/loan_datasets.py:39-53)
- adult: the '?'-row filter on ALL columns, the '<=50K.'/'>50K.'
  suffixed label map, income excluded from z-scoring
  (adult_datasets.py:39-53)
- covtype: NaN row drop after column selection, Cover_Type excluded
  from z-scoring, test = first 2000 rows (covtype_datasets.py:35-66)

Each case compares byte-level (float32-exact) x_data/label against an
inline numpy/pandas transcription of the reference loader written
independently below, and the digit-interleave labels are additionally
cross-checked against a decimal-string interleaver (a genuinely different
algorithm, tolerance-bounded because the reference's float loop
accumulates representation error digit by digit).
"""
import numpy as np
import pandas as pd
import pytest

from cdgvae_tpu.data.tabular.datasets import (
    interleave_float,
    load_tabular,
    load_tabular_tvae,
)


# ------------------------------------------------------------- fixtures


def loan_fixture(n=60, seed=7):
    """Real-format Bank_Personal_Loan_Modelling.csv excerpt: full kaggle
    column set, ID column, negative Experience rows (present in the real
    data), zero mortgages."""
    rng = np.random.default_rng(seed)
    age = rng.integers(23, 68, n)
    exp = age - 23 - rng.integers(0, 5, n)
    exp[:3] = [-1, -2, -3]  # the real file has negative experience rows
    income = rng.integers(8, 225, n)
    return pd.DataFrame({
        "ID": np.arange(1, n + 1),
        "Age": age,
        "Experience": exp,
        "Income": income,
        "ZIP Code": rng.integers(90000, 96652, n),
        "Family": rng.integers(1, 5, n),
        "CCAvg": (rng.uniform(0, 10, n)).round(2),
        "Education": rng.integers(1, 4, n),
        "Mortgage": np.where(rng.uniform(size=n) < 0.7, 0,
                             rng.integers(75, 635, n)),
        "Personal Loan": rng.integers(0, 2, n),
        "Securities Account": rng.integers(0, 2, n),
        "CD Account": rng.integers(0, 2, n),
        "Online": rng.integers(0, 2, n),
        "CreditCard": rng.integers(0, 2, n),
    })


def adult_fixture(n=64, seed=11):
    """Real-format adult.csv excerpt: full UCI column set, '?' markers in
    workclass/occupation/native-country (those rows must be dropped even
    though the '?' is outside the modeling columns), and the dot-suffixed
    '<=50K.'/'>50K.' labels that appear in the UCI test partition."""
    rng = np.random.default_rng(seed)
    workclass = rng.choice(
        ["Private", "Self-emp-not-inc", "State-gov"], n).astype(object)
    occupation = rng.choice(
        ["Tech-support", "Craft-repair", "Sales"], n).astype(object)
    country = rng.choice(["United-States", "Mexico"], n).astype(object)
    workclass[4] = "?"
    occupation[9] = "?"
    country[13] = "?"
    income = rng.choice(["<=50K", ">50K"], n).astype(object)
    income[20] = "<=50K."
    income[21] = ">50K."
    return pd.DataFrame({
        "age": rng.integers(17, 90, n),
        "workclass": workclass,
        "fnlwgt": rng.integers(12285, 1484705, n),
        "education": rng.choice(["Bachelors", "HS-grad", "11th"], n),
        "educational-num": rng.integers(1, 17, n),
        "marital-status": rng.choice(["Married-civ-spouse",
                                      "Never-married"], n),
        "occupation": occupation,
        "relationship": rng.choice(["Husband", "Not-in-family"], n),
        "race": rng.choice(["White", "Black"], n),
        "gender": rng.choice(["Male", "Female"], n),
        "capital-gain": np.where(rng.uniform(size=n) < 0.9, 0,
                                 rng.integers(114, 99999, n)),
        "capital-loss": np.where(rng.uniform(size=n) < 0.95, 0,
                                 rng.integers(155, 4356, n)),
        "hours-per-week": rng.integers(1, 99, n),
        "native-country": country,
        "income": income,
    })


def covtype_fixture(n=60, seed=13):
    """Real-format covtype.csv excerpt: the 7 terrain columns + Cover_Type
    plus a few of the real file's extra columns, with NaN rows in a
    modeling column (must drop) and in a non-modeling column (must keep)."""
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "Elevation": rng.integers(1859, 3858, n).astype(float),
        "Aspect": rng.integers(0, 360, n).astype(float),
        "Slope": rng.integers(0, 66, n).astype(float),
        "Horizontal_Distance_To_Hydrology": rng.integers(0, 1397, n)
        .astype(float),
        "Vertical_Distance_To_Hydrology": rng.integers(-173, 601, n)
        .astype(float),
        "Horizontal_Distance_To_Roadways": rng.integers(0, 7117, n)
        .astype(float),
        "Hillshade_9am": rng.integers(0, 254, n).astype(float),
        "Horizontal_Distance_To_Fire_Points": rng.integers(0, 7173, n)
        .astype(float),
        "Soil_Type1": rng.integers(0, 2, n).astype(float),
        "Cover_Type": rng.integers(1, 8, n).astype(float),
    })
    df.loc[5, "Slope"] = np.nan              # modeling column -> row drops
    df.loc[8, "Hillshade_9am"] = np.nan      # non-modeling -> row survives
    return df


def write_csv(tmp_path, name, df):
    path = tmp_path / name
    df.to_csv(path, index=False)
    return str(tmp_path)


# ---------------------------------------- inline reference transcriptions
# Written straight off the reference loaders, independent of
# cdgvae_tpu.data.tabular.datasets internals (only interleave_float is
# shared — its float-loop numerics ARE the parity contract, and it is
# cross-validated separately below).


def _bijection(df01, topology):
    cols = []
    for group in topology:
        block = df01[group].to_numpy()
        if len(group) == 1:
            cols.append(block)
        elif len(group) == 2:
            cols.append(np.array(
                [[interleave_float(x, y)] for x, y in block]))
        elif len(group) == 3:
            inner = [interleave_float(x, y) for x, y in block[:, :2]]
            cols.append(np.array(
                [[interleave_float(a, b)]
                 for a, b in zip(inner, block[:, 2])]))
    return np.concatenate(cols, axis=1)


def reference_loan(csv_path):
    df = pd.read_csv(csv_path)
    df = df.sample(frac=1, random_state=1).reset_index(drop=True)
    df = df.drop(columns=["ID"])
    continuous = ["CCAvg", "Mortgage", "Income", "Experience", "Age"]
    topology = [["Mortgage", "Income"], ["Experience", "Age"], ["CCAvg"]]
    df = df[continuous]
    df_ = (df - df.mean(axis=0)) / df.std(axis=0)
    train = df_.iloc[:4000]
    df01 = (df_ - df_.min(axis=0)) / (df_.max(axis=0) - df_.min(axis=0))
    label = _bijection(df01, topology)[:4000]
    return train.to_numpy(), label


def reference_adult(csv_path):
    df = pd.read_csv(csv_path)
    df = df.sample(frac=1, random_state=1).reset_index(drop=True)
    df = df[(df == "?").sum(axis=1) == 0]
    df["income"] = df["income"].map(
        {"<=50K": 0, ">50K": 1, "<=50K.": 0, ">50K.": 1})
    continuous = ["income", "educational-num", "capital-gain",
                  "capital-loss", "hours-per-week"]
    topology = [["capital-gain"], ["capital-loss"],
                ["income", "educational-num", "hours-per-week"]]
    df = df[continuous]
    scaling = [x for x in continuous if x != "income"]
    df_ = df.copy()
    df_[scaling] = (df[scaling] - df[scaling].mean(axis=0)) / \
        df[scaling].std(axis=0)
    train = df_.iloc[:40000]
    df01 = (df_ - df_.min(axis=0)) / (df_.max(axis=0) - df_.min(axis=0))
    label = _bijection(df01, topology)[:40000]
    return train.to_numpy(), label


def reference_covtype_test_split(csv_path):
    base = pd.read_csv(csv_path)
    base = base.sample(frac=1, random_state=5).reset_index(drop=True)
    continuous = ["Horizontal_Distance_To_Hydrology",
                  "Vertical_Distance_To_Hydrology",
                  "Horizontal_Distance_To_Roadways",
                  "Horizontal_Distance_To_Fire_Points",
                  "Elevation", "Aspect", "Slope", "Cover_Type"]
    topology = [["Horizontal_Distance_To_Hydrology"],
                ["Vertical_Distance_To_Hydrology"],
                ["Horizontal_Distance_To_Roadways",
                 "Horizontal_Distance_To_Fire_Points"],
                ["Elevation"], ["Aspect"], ["Slope", "Cover_Type"]]
    df = base[continuous].dropna(axis=0)
    scaling = [x for x in continuous if x != "Cover_Type"]
    df_ = df.copy()
    df_[scaling] = (df[scaling] - df[scaling].mean(axis=0)) / \
        df[scaling].std(axis=0)
    test = df_.iloc[:2000]
    df01 = (df_ - df_.min(axis=0)) / (df_.max(axis=0) - df_.min(axis=0))
    label = _bijection(df01, topology)[:2000]
    return test.to_numpy(), label


# ------------------------------------------------------------------ tests


class TestRealFormatParity:
    def test_loan(self, tmp_path):
        data_dir = write_csv(tmp_path, "Bank_Personal_Loan_Modelling.csv",
                             loan_fixture())
        got = load_tabular("loan", train=True, data_dir=data_dir)
        ref_x, ref_y = reference_loan(
            tmp_path / "Bank_Personal_Loan_Modelling.csv")
        assert got.x_data.shape == ref_x.shape == (60, 5)
        np.testing.assert_array_equal(got.x_data,
                                      ref_x.astype(np.float32))
        np.testing.assert_array_equal(got.label,
                                      np.clip(ref_y, 0, 1)
                                      .astype(np.float32))

    def test_adult(self, tmp_path):
        data_dir = write_csv(tmp_path, "adult.csv", adult_fixture())
        got = load_tabular("adult", train=True, data_dir=data_dir)
        ref_x, ref_y = reference_adult(tmp_path / "adult.csv")
        # 3 '?' rows dropped from 64
        assert got.x_data.shape == ref_x.shape == (61, 5)
        np.testing.assert_array_equal(got.x_data,
                                      ref_x.astype(np.float32))
        np.testing.assert_array_equal(got.label,
                                      np.clip(ref_y, 0, 1)
                                      .astype(np.float32))
        # the dot-suffixed labels mapped, not dropped: income column is
        # exactly {0, 1}
        assert set(np.unique(got.x_data[:, 0])) == {0.0, 1.0}

    def test_covtype(self, tmp_path):
        data_dir = write_csv(tmp_path, "covtype.csv", covtype_fixture())
        got = load_tabular("covtype", train=False, data_dir=data_dir)
        ref_x, ref_y = reference_covtype_test_split(tmp_path / "covtype.csv")
        # one NaN row dropped (modeling column); the non-modeling NaN stays
        assert got.x_data.shape == ref_x.shape == (59, 8)
        np.testing.assert_array_equal(got.x_data,
                                      ref_x.astype(np.float32))
        np.testing.assert_array_equal(got.label,
                                      np.clip(ref_y, 0, 1)
                                      .astype(np.float32))

    def test_covtype_train_complement(self, tmp_path):
        # train = rows 2000: — empty at fixture scale, but must not crash
        data_dir = write_csv(tmp_path, "covtype.csv", covtype_fixture())
        got = load_tabular("covtype", train=True, data_dir=data_dir)
        assert got.x_data.shape == (0, 8)

    def test_loan_slice_boundary(self, tmp_path):
        # >4000 rows: train/test split lands exactly at row 4000
        data_dir = write_csv(tmp_path, "Bank_Personal_Loan_Modelling.csv",
                             loan_fixture(n=4100))
        train = load_tabular("loan", train=True, data_dir=data_dir)
        test = load_tabular("loan", train=False, data_dir=data_dir)
        assert train.x_data.shape == (4000, 5)
        assert test.x_data.shape == (100, 5)
        ref_x, ref_y = reference_loan(
            tmp_path / "Bank_Personal_Loan_Modelling.csv")
        np.testing.assert_array_equal(train.x_data,
                                      ref_x.astype(np.float32))


class TestTVAERealFormat:
    def test_adult_tvae(self, tmp_path):
        data_dir = write_csv(tmp_path, "adult.csv", adult_fixture())
        got = load_tabular_tvae("adult", data_dir=data_dir, random_state=0)
        # column order = flattened topology; income is one-hot (2 cats),
        # each continuous column contributes 1 + n_components outputs
        info = got.transformer.output_info_list
        assert len(info) == 5
        assert got.x_data.shape[0] == got.label.shape[0] == 61
        assert got.x_data.shape[1] == got.transformer.output_dimensions
        # TVAE labels normalize the RAW frame (TabularDataset2 path:
        # adult_datasets.py:154-156), not the z-scored one
        df = pd.read_csv(tmp_path / "adult.csv")
        df = df.sample(frac=1, random_state=1).reset_index(drop=True)
        df = df[(df == "?").sum(axis=1) == 0]
        df["income"] = df["income"].map(
            {"<=50K": 0, ">50K": 1, "<=50K.": 0, ">50K.": 1})
        df = df[["income", "educational-num", "capital-gain",
                 "capital-loss", "hours-per-week"]]
        df01 = (df - df.min(axis=0)) / (df.max(axis=0) - df.min(axis=0))
        ref_y = _bijection(df01, [["capital-gain"], ["capital-loss"],
                                  ["income", "educational-num",
                                   "hours-per-week"]])
        np.testing.assert_array_equal(
            got.label, np.clip(ref_y, 0, 1).astype(np.float32))

    def test_loan_tvae(self, tmp_path):
        data_dir = write_csv(tmp_path, "Bank_Personal_Loan_Modelling.csv",
                             loan_fixture())
        got = load_tabular_tvae("loan", data_dir=data_dir, random_state=0)
        assert got.x_data.shape[0] == 60
        assert list(got.raw.columns) == ["Mortgage", "Income",
                                         "Experience", "Age", "CCAvg"]


class TestInterleaveCrossValidation:
    """Validate the float digit-interleave loop against a decimal-string
    interleaver — a structurally different algorithm."""

    @staticmethod
    def string_interleave(a, b, digits=12):
        sa = f"{a:.{digits}f}".split(".")[1]
        sb = f"{b:.{digits}f}".split(".")[1]
        out = "0." + "".join(x + y for x, y in zip(sa, sb))
        return float(out)

    def test_against_string_method(self):
        rng = np.random.default_rng(42)
        for _ in range(200):
            a, b = rng.random(2)
            # the float loop accumulates representation error from ~digit
            # 8 of each operand (interleaved digit ~16); 1e-6 bounds it
            assert interleave_float(a, b) == pytest.approx(
                self.string_interleave(a, b), abs=1e-6)

    def test_exact_short_decimals(self):
        # decimals exactly representable to few digits: loop digits are
        # near-exact and match the string method tightly
        assert interleave_float(0.25, 0.5) == pytest.approx(0.2550, abs=1e-9)
        assert interleave_float(0.0, 0.0) == 0.0
        assert interleave_float(0.5, 0.0) == pytest.approx(0.50, abs=1e-9)

    def test_monotone_in_first_argument(self):
        # the interleave is monotone in a for fixed b (bijective label
        # property the chain topology depends on)
        vals = [interleave_float(a, 0.3713) for a in np.linspace(0, 0.9, 50)]
        assert all(x < y for x, y in zip(vals, vals[1:]))
