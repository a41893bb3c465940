"""ML-efficacy harness: train-on-synthetic / test-on-real
(reference tabular/modules/evaluation.py)."""
from __future__ import annotations

import numpy as np


def regression_eval(train, test, target):
    from sklearn.linear_model import LinearRegression
    from sklearn.ensemble import (RandomForestRegressor,
                                  GradientBoostingRegressor)
    covariates = [x for x in train.columns if x != target]
    result = []
    for name, regr in [
            ("linear", LinearRegression()),
            ("RF", RandomForestRegressor(random_state=0)),
            ("GradBoost", GradientBoostingRegressor(random_state=0))]:
        regr.fit(train[covariates], train[target])
        pred = regr.predict(test[covariates])
        rsq = float(np.sum((test[target].to_numpy() - pred) ** 2))
        rsq /= np.var(test[target].to_numpy()) * len(test)
        rsq = 1.0 - rsq
        result.append((name, rsq))
        print(f"[{name}] R^2: {rsq:.3f}")
    return result


def classification_eval(train, test, target):
    from sklearn.linear_model import LogisticRegression
    from sklearn.ensemble import (RandomForestClassifier,
                                  GradientBoostingClassifier)
    from sklearn.metrics import f1_score
    # prefix (not exact) exclusion replicates the reference byte-for-byte
    # (tabular/modules/evaluation.py:39) — it differs from
    # regression_eval's exact match (:18) in the reference too
    covariates = [x for x in train.columns if not x.startswith(target)]
    result = []
    for name, clf in [
            ("logistic", LogisticRegression(max_iter=1000)),
            ("RF", RandomForestClassifier(random_state=0)),
            ("GradBoost", GradientBoostingClassifier(random_state=0))]:
        clf.fit(train[covariates], train[target])
        pred = clf.predict(test[covariates])
        f1 = float(f1_score(test[target], pred, average="micro"))
        result.append((name, f1))
        print(f"[{name}] F1: {f1:.3f}")
    return result
