"""Hyperparameter optimization for recommenders.

Parity target: reference Optuna mixin
(``models/optimization/optuna_mixin.py:168-240``) — a TPE loop over
fit/predict/metric trials. Optuna is not installed in this
container, so the optimizer uses Optuna when importable and falls
back to seeded random search with identical semantics (same search
space dict, same trial budget, same objective).

Search space format: ``{"param": [low, high]}`` for continuous /
integer ranges (type inferred from the defaults), or
``{"param": [v1, v2, v3, ...]}`` categorical when more than two
values or non-numeric.
"""

from __future__ import annotations

import random
import warnings
from typing import Callable, Optional

from replay_spark.data.dataset import Dataset

__all__ = ["optimize"]

try:  # pragma: no cover - optional dependency
    import optuna

    _HAS_OPTUNA = True
except ImportError:
    _HAS_OPTUNA = False


def _sample(space: dict, rng: random.Random) -> dict:
    params = {}
    for name, spec in space.items():
        if (
            isinstance(spec, list)
            and len(spec) == 2
            and all(isinstance(v, (int, float)) for v in spec)
        ):
            low, high = spec
            if isinstance(low, int) and isinstance(high, int):
                params[name] = rng.randint(low, high)
            else:
                params[name] = rng.uniform(low, high)
        else:
            params[name] = rng.choice(list(spec))
    return params


def optimize(
    model_factory: Callable[..., object],
    train_dataset: Dataset,
    test_dataset: Dataset,
    param_borders: dict,
    criterion: Callable,
    k: int = 10,
    budget: int = 10,
    higher_is_better: bool = True,
    seed: Optional[int] = 42,
) -> dict:
    """Search ``param_borders`` for the best ``criterion`` value.

    ``model_factory(**params)`` builds a model; each trial runs
    fit → predict(k) → criterion(recs, test_interactions).
    Returns ``{"best_params", "best_value", "trials"}``.
    """
    gt = test_dataset.interactions
    trials = []

    def objective(params: dict) -> float:
        model = model_factory(**params)
        recs = model.fit_predict(train_dataset, k=k)
        result = criterion(recs, gt)
        value = next(iter(result.values())) if isinstance(result, dict) else result
        trials.append({"params": params, "value": value})
        return value

    if _HAS_OPTUNA:  # pragma: no cover - not available here

        def optuna_objective(trial):
            params = {}
            for name, spec in param_borders.items():
                if (
                    isinstance(spec, list)
                    and len(spec) == 2
                    and all(isinstance(v, (int, float)) for v in spec)
                ):
                    low, high = spec
                    if isinstance(low, int) and isinstance(high, int):
                        params[name] = trial.suggest_int(name, low, high)
                    else:
                        params[name] = trial.suggest_float(name, low, high)
                else:
                    params[name] = trial.suggest_categorical(name, list(spec))
            return objective(params)

        direction = "maximize" if higher_is_better else "minimize"
        sampler = optuna.samplers.TPESampler(seed=seed)
        study = optuna.create_study(direction=direction, sampler=sampler)
        study.optimize(optuna_objective, n_trials=budget)
        return {
            "best_params": study.best_params,
            "best_value": study.best_value,
            "trials": trials,
        }

    # loud fallback, mirroring the reference's FeatureUnavailableWarning
    # (optuna_mixin.py:235-240): a caller asking for TPE must know they
    # got random search instead
    warnings.warn(
        "optuna is not installed: optimize() is falling back to SEEDED "
        "RANDOM SEARCH over the same search space and trial budget. "
        "Install optuna to get TPE sampling.",
        RuntimeWarning,
        stacklevel=2,
    )
    rng = random.Random(seed)
    best_params, best_value = None, None
    for _ in range(budget):
        params = _sample(param_borders, rng)
        value = objective(params)
        better = (
            best_value is None
            or (higher_is_better and value > best_value)
            or (not higher_is_better and value < best_value)
        )
        if better:
            best_params, best_value = params, value
    return {"best_params": best_params, "best_value": best_value, "trials": trials}
