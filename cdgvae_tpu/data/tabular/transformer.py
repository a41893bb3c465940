"""CTGAN-lineage tabular feature transformer stack, self-contained.

Re-implements the behaviors of the reference's vendored rdt/CTGAN stack
(reference tabular/modules/data_transformer.py, numerical.py,
transformer_base.py, transformer_null.py) without the rdt dependency:

* ``ClusterBasedNormalizer`` — Bayesian GMM (dirichlet-process prior, max 10
  components, fixed random_state; numerical.py:388-394) per continuous
  column; transform emits a [scalar in ±0.99, one-hot component] pair where
  the component is SAMPLED from the posterior responsibilities
  (numerical.py:407-445); reverse is ``v * 4σ_k + μ_k`` (numerical.py:447-457).
* ``OneHotEncoder`` — category order = order of first appearance; unknown
  values reverse-map via argmax.
* ``DataTransformer`` — per-column fit/transform/inverse with
  ``output_info_list`` of (dim, activation_fn) spans — 'tanh' for the scalar,
  'softmax' for one-hots (data_transformer.py:42-79) — and optional gaussian
  noise injection on inverse via per-column ``sigmas``
  (data_transformer.py:184-195).

Missing values: columns are mean-filled at fit/transform (the minimal
NullTransformer behavior; the reference datasets dropna upstream anyway).
"""
from __future__ import annotations

from collections import namedtuple

import numpy as np
import pandas as pd
from sklearn.mixture import BayesianGaussianMixture

SpanInfo = namedtuple("SpanInfo", ["dim", "activation_fn"])
ColumnTransformInfo = namedtuple(
    "ColumnTransformInfo",
    ["column_name", "column_type", "transform", "output_info",
     "output_dimensions"])

STD_MULTIPLIER = 4


class OneHotEncoder:
    """Minimal one-hot encoder; category order = first appearance."""

    def fit(self, data: pd.Series):
        self.dummies = list(pd.unique(data.dropna()))
        self._index = {v: i for i, v in enumerate(self.dummies)}
        return self

    def transform(self, data: pd.Series) -> np.ndarray:
        out = np.zeros((len(data), len(self.dummies)))
        for r, v in enumerate(data):
            i = self._index.get(v)
            if i is not None:
                out[r, i] = 1.0
        return out

    def reverse_transform(self, onehot: np.ndarray) -> np.ndarray:
        idx = np.argmax(onehot, axis=1)
        return np.array([self.dummies[i] for i in idx])


MAX_DECIMALS = 14  # float64 resolves ~15 significant decimal digits


def learn_rounding_digits(data: np.ndarray) -> int | None:
    """Number of decimal places the column actually uses, or None when the
    data has no decimals / uses more precision than float64 resolves
    (FloatFormatter._learn_rounding_digits semantics,
    reference tabular/modules/numerical.py:79-90)."""
    finite = data[np.isfinite(data)]
    if len(finite) == 0 or (finite % 1 == 0).all():
        return None
    if not (finite == finite.round(MAX_DECIMALS)).all():
        return None
    for decimal in range(MAX_DECIMALS + 1):
        if (finite == finite.round(decimal)).all():
            return decimal
    return None


class ClusterBasedNormalizer:
    """Mode-specific normalization via a Bayesian Gaussian mixture.

    ``learn_rounding_scheme`` / ``enforce_min_max_values`` mirror the
    reference FloatFormatter flags (numerical.py:119-133, 157-182):
    reverse_transform rounds to the fitted decimal place and/or clips to
    the fitted [min, max]. Integer-dtype columns are ALWAYS rounded to 0
    digits on reverse (the reference does this regardless of the flag,
    numerical.py:175-177) so the later dtype restore rounds instead of
    truncating."""

    def __init__(self, max_clusters: int = 10,
                 weight_threshold: float = 0.005, random_state: int = 0,
                 learn_rounding_scheme: bool = False,
                 enforce_min_max_values: bool = False):
        self.max_clusters = max_clusters
        self.weight_threshold = weight_threshold
        self.random_state = random_state
        self.learn_rounding_scheme = learn_rounding_scheme
        self.enforce_min_max_values = enforce_min_max_values
        self._rounding_digits = None
        self._min_value = None
        self._max_value = None
        self._is_integer = False

    def fit(self, data: np.ndarray):
        raw = np.asarray(data)
        self._is_integer = raw.dtype.kind in "iu"
        data = raw.astype(np.float64).ravel()
        if self.enforce_min_max_values:
            self._min_value = float(np.nanmin(data))
            self._max_value = float(np.nanmax(data))
        if self.learn_rounding_scheme:
            self._rounding_digits = learn_rounding_digits(
                data[~np.isnan(data)])
        # fill is ALWAYS the column mean: a NaN seen only at transform time
        # must not be imputed with 0.0 (far outside the fitted components)
        self._fill = float(np.nanmean(data))
        data = np.where(np.isnan(data), self._fill, data)
        self._bgm = BayesianGaussianMixture(
            n_components=min(len(data), self.max_clusters),
            weight_concentration_prior_type="dirichlet_process",
            weight_concentration_prior=0.001,
            n_init=1,
            random_state=self.random_state,
        )
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            self._bgm.fit(data.reshape(-1, 1))
        self.valid_component_indicator = (
            self._bgm.weights_ > self.weight_threshold)
        return self

    @property
    def num_components(self) -> int:
        return int(self.valid_component_indicator.sum())

    def transform(self, data: np.ndarray,
                  rng: np.random.Generator | None = None) -> np.ndarray:
        """Returns [n, 2]: (normalized scalar, selected component index)."""
        rng = rng or np.random.default_rng(self.random_state)
        data = np.asarray(data, dtype=np.float64).ravel()
        data = np.where(np.isnan(data), self._fill, data)
        x = data.reshape(-1, 1)
        means = self._bgm.means_.reshape(1, -1)
        stds = np.sqrt(self._bgm.covariances_).reshape(1, -1)
        normalized = (x - means) / (STD_MULTIPLIER * stds)
        normalized = normalized[:, self.valid_component_indicator]
        probs = self._bgm.predict_proba(x)[:, self.valid_component_indicator]
        probs = probs + 1e-6
        probs /= probs.sum(axis=1, keepdims=True)
        # vectorised categorical sampling over rows (the reference loops
        # np.random.choice per row, numerical.py:427-434)
        cum = probs.cumsum(axis=1)
        u = rng.uniform(size=(len(x), 1))
        selected = (u > cum).sum(axis=1)
        chosen = np.clip(normalized[np.arange(len(x)), selected], -0.99, 0.99)
        return np.stack([chosen, selected.astype(np.float64)], axis=1)

    def reverse_transform(self, data: np.ndarray) -> np.ndarray:
        """data [n, 2] (normalized, component) -> original values.

        Applies the FloatFormatter reverse fidelity steps in the reference's
        order (numerical.py:157-182): clip to fitted [min, max] when
        ``enforce_min_max_values``, then round — to the learned decimal place
        when ``learn_rounding_scheme``, and ALWAYS to 0 digits for
        integer-dtype columns so the caller's dtype restore rounds instead
        of truncating."""
        normalized = np.clip(data[:, 0], -1, 1)
        selected = data[:, 1].astype(int)
        means = self._bgm.means_.reshape(-1)[self.valid_component_indicator]
        stds = np.sqrt(self._bgm.covariances_).reshape(-1)[
            self.valid_component_indicator]
        out = normalized * STD_MULTIPLIER * stds[selected] + means[selected]
        if self.enforce_min_max_values:
            out = np.clip(out, self._min_value, self._max_value)
        if self.learn_rounding_scheme or self._is_integer:
            out = out.round(self._rounding_digits or 0)
        return out


class DataTransformer:
    """Column-wise transformer: continuous -> [tanh scalar, softmax one-hot],
    discrete -> softmax one-hot."""

    def __init__(self, max_clusters: int = 10,
                 weight_threshold: float = 0.005,
                 learn_rounding_scheme: bool = False,
                 enforce_min_max_values: bool = False):
        self._max_clusters = max_clusters
        self._weight_threshold = weight_threshold
        self._learn_rounding_scheme = learn_rounding_scheme
        self._enforce_min_max_values = enforce_min_max_values

    def fit(self, raw_data: pd.DataFrame, discrete_columns=(),
            random_state: int = 0):
        self.dataframe = isinstance(raw_data, pd.DataFrame)
        if not self.dataframe:
            raw_data = pd.DataFrame(
                raw_data,
                columns=[str(i) for i in range(raw_data.shape[1])])
            discrete_columns = [str(c) for c in discrete_columns]
        self._column_raw_dtypes = raw_data.infer_objects().dtypes
        self.output_info_list = []
        self.output_dimensions = 0
        self._column_transform_info_list = []
        self._rng = np.random.default_rng(random_state)
        for column in raw_data.columns:
            if column in discrete_columns:
                ohe = OneHotEncoder().fit(raw_data[column])
                info = ColumnTransformInfo(
                    column, "discrete", ohe,
                    [SpanInfo(len(ohe.dummies), "softmax")],
                    len(ohe.dummies))
            else:
                gm = ClusterBasedNormalizer(
                    max_clusters=min(len(raw_data), self._max_clusters),
                    weight_threshold=self._weight_threshold,
                    random_state=random_state,
                    learn_rounding_scheme=self._learn_rounding_scheme,
                    enforce_min_max_values=self._enforce_min_max_values,
                ).fit(raw_data[column].to_numpy())
                k = gm.num_components
                info = ColumnTransformInfo(
                    column, "continuous", gm,
                    [SpanInfo(1, "tanh"), SpanInfo(k, "softmax")], 1 + k)
            self.output_info_list.append(info.output_info)
            self.output_dimensions += info.output_dimensions
            self._column_transform_info_list.append(info)
        return self

    def transform(self, raw_data) -> np.ndarray:
        if not isinstance(raw_data, pd.DataFrame):
            raw_data = pd.DataFrame(
                raw_data,
                columns=[str(i) for i in range(raw_data.shape[1])])
        outs = []
        for info in self._column_transform_info_list:
            col = raw_data[info.column_name]
            if info.column_type == "continuous":
                t = info.transform.transform(col.to_numpy(), rng=self._rng)
                block = np.zeros((len(t), info.output_dimensions))
                block[:, 0] = t[:, 0]
                block[np.arange(len(t)), t[:, 1].astype(int) + 1] = 1.0
            else:
                block = info.transform.transform(col)
            outs.append(block)
        return np.concatenate(outs, axis=1).astype(float)

    def inverse_transform(self, data: np.ndarray, sigmas=None):
        st = 0
        cols, names = [], []
        for info in self._column_transform_info_list:
            dim = info.output_dimensions
            block = data[:, st: st + dim]
            if info.column_type == "continuous":
                pair = np.stack(
                    [block[:, 0], np.argmax(block[:, 1:], axis=1)], axis=1)
                if sigmas is not None:
                    pair[:, 0] = np.random.normal(pair[:, 0], sigmas[st])
                cols.append(info.transform.reverse_transform(pair))
            else:
                cols.append(info.transform.reverse_transform(block))
            names.append(info.column_name)
            st += dim
        recovered = pd.DataFrame(
            np.column_stack(cols), columns=names).astype(
                self._column_raw_dtypes)
        return recovered if self.dataframe else recovered.to_numpy()
