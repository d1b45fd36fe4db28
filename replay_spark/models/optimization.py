"""Hyperparameter optimization for recommenders.

Parity target: reference Optuna mixin
(``models/optimization/optuna_mixin.py:168-240``) — a TPE loop over
fit/predict/metric trials. Optuna is used when importable; otherwise
the loop runs a vendored Parzen-estimator sampler (``_TPESampler``,
Bergstra et al. 2011 — the same family of algorithm as Optuna's
TPESampler) with identical semantics: same search space dict, same
trial budget, same objective, seeded/deterministic. A RuntimeWarning
still flags the substitution.

Search space format: ``{"param": [low, high]}`` for continuous /
integer ranges (type inferred from the defaults), or
``{"param": [v1, v2, v3, ...]}`` categorical when more than two
values or non-numeric.
"""

from __future__ import annotations

import math
import random
import warnings
from typing import Callable, Optional

from replay_spark.data.dataset import Dataset

__all__ = [
    "CmaEsSampler",
    "GridExhausted",
    "GridSampler",
    "MOStudy",
    "MedianPruner",
    "RandomSampler",
    "Study",
    "TrialPruned",
    "optimize",
    "optimize_objective",
    "optimize_objective_multi",
]

try:  # pragma: no cover - optional dependency
    import optuna

    _HAS_OPTUNA = True
except ImportError:
    _HAS_OPTUNA = False


def _is_range(spec) -> bool:
    return (
        isinstance(spec, list)
        and len(spec) == 2
        and all(isinstance(v, (int, float)) for v in spec)
        and not any(isinstance(v, bool) for v in spec)
    )


def _sample(space: dict, rng: random.Random) -> dict:
    params = {}
    for name, spec in space.items():
        if _is_range(spec):
            low, high = spec
            if isinstance(low, int) and isinstance(high, int):
                params[name] = rng.randint(low, high)
            else:
                params[name] = rng.uniform(low, high)
        else:
            params[name] = rng.choice(list(spec))
    return params


def _normalize_space(space: dict) -> dict:
    """Accept BOTH search-space formats — this package's terse
    ``{param: [low, high] | [choices...]}`` and the reference's
    ``{param: {"type": ..., "args": [...]}}`` (optuna_mixin types:
    int / uniform / loguniform / loguniform_int / categorical) — and
    normalize to ("num", lo, hi, is_int, is_log) / ("cat", choices)."""
    norm = {}
    for name, spec in space.items():
        if isinstance(spec, dict) and "type" in spec:
            t, args = spec["type"], list(spec["args"])
            if t == "categorical":
                norm[name] = ("cat", args)
            elif t in ("int", "uniform", "loguniform", "loguniform_int"):
                lo, hi = float(args[0]), float(args[1])
                is_int = t in ("int", "loguniform_int")
                is_log = t.startswith("loguniform")
                if is_log and lo <= 0:
                    raise ValueError(f"loguniform bounds must be > 0 for {name}")
                norm[name] = ("num", lo, hi, is_int, is_log)
            else:
                raise ValueError(f"unknown search-space type {t!r} for {name}")
        elif _is_range(spec):
            lo, hi = spec
            is_int = isinstance(lo, int) and isinstance(hi, int)
            norm[name] = ("num", float(lo), float(hi), is_int, False)
        else:
            norm[name] = ("cat", list(spec))
    return norm


def _sampler_space(norm: dict) -> dict:
    """Sampler-facing space: numeric params become float ranges in
    (log-)transformed coordinates; the sampler never sees ints."""
    out = {}
    for name, d in norm.items():
        if d[0] == "cat":
            out[name] = d[1]
        else:
            lo, hi = d[1], d[2]
            if d[4]:
                lo, hi = math.log(lo), math.log(hi)
            out[name] = [float(lo), float(hi)]
    return out


def _decode_params(norm: dict, raw: dict) -> dict:
    out = {}
    for name, v in raw.items():
        d = norm[name]
        if d[0] == "cat":
            out[name] = v
        else:
            x = math.exp(v) if d[4] else v
            if d[3]:
                x = int(min(max(round(x), d[1]), d[2]))
            out[name] = x
    return out


class _TPESampler:
    """Minimal Tree-structured Parzen Estimator (Bergstra et al. 2011,
    "Algorithms for Hyper-Parameter Optimization", NeurIPS).

    Vendored stand-in for Optuna's TPESampler when optuna is not
    installed — same search-space dict, same trial budget,
    deterministic under a fixed seed. Per trial (after ``n_startup``
    random trials): split observed trials into good (top ``gamma``
    fraction by objective, direction-aware) and bad; for numeric
    params draw ``n_candidates`` from a Parzen (Gaussian-kernel)
    density over the good values and keep the candidate maximizing
    the good/bad density ratio l(x)/g(x); for categoricals, weight
    choices by smoothed good/bad frequency ratio. Independent 1-D
    estimators per param (as in the paper's non-tree spaces).
    """

    def __init__(
        self,
        space: dict,
        seed: Optional[int],
        n_startup: int = 5,
        n_candidates: int = 24,
        gamma: float = 0.25,
    ):
        self.space = space
        self.rng = random.Random(seed)
        self.n_startup = n_startup
        self.n_candidates = n_candidates
        self.gamma = gamma

    @staticmethod
    def _density(x: float, centers: list, bw: float) -> float:
        import math

        return sum(
            math.exp(-0.5 * ((x - c) / bw) ** 2) for c in centers
        ) / len(centers)

    def suggest(self, trials: list, higher_is_better: bool) -> dict:
        if len(trials) < self.n_startup:
            return _sample(self.space, self.rng)
        ordered = sorted(
            trials, key=lambda t: t["value"], reverse=higher_is_better
        )
        n_good = max(1, int(round(self.gamma * len(ordered))))
        good, bad = ordered[:n_good], ordered[n_good:] or ordered[:n_good]
        params = {}
        for name, spec in self.space.items():
            gvals = [t["params"][name] for t in good]
            bvals = [t["params"][name] for t in bad]
            if _is_range(spec):
                low, high = spec
                is_int = isinstance(low, int) and isinstance(high, int)
                bw = max(
                    (high - low) / (1.0 + len(gvals)) ** 0.5, 1e-12
                )
                best_x, best_ratio = None, -1.0
                for _ in range(self.n_candidates):
                    x = self.rng.gauss(self.rng.choice(gvals), bw)
                    x = min(max(x, low), high)
                    ratio = self._density(x, gvals, bw) / (
                        self._density(x, bvals, bw) + 1e-12
                    )
                    if ratio > best_ratio:
                        best_x, best_ratio = x, ratio
                if is_int:
                    params[name] = int(min(max(round(best_x), low), high))
                else:
                    params[name] = float(best_x)
            else:
                choices = list(spec)
                g_n, b_n = len(gvals), len(bvals)
                weights = [
                    ((1.0 + gvals.count(c)) / (g_n + len(choices)))
                    / ((1.0 + bvals.count(c)) / (b_n + len(choices)))
                    for c in choices
                ]
                params[name] = self.rng.choices(choices, weights=weights)[0]
        return params


class TrialPruned(Exception):
    """Raised inside an objective to abandon the running trial (the
    optuna.TrialPruned shape); ``optimize_objective`` records the
    trial as pruned with its last reported intermediate value."""


class MedianPruner:
    """Median early-stopping rule (the Optuna ``MedianPruner``
    semantics, reference ``models/optimization/optuna_mixin.py``'s
    pruner hook): prune at step ``s`` when the trial's reported value
    is strictly worse than the MEDIAN of completed trials' values at
    the same step. ``n_startup_trials`` completed trials are required
    before any pruning; the first ``n_warmup_steps`` steps of every
    trial are never pruned."""

    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0):
        if n_startup_trials < 0 or n_warmup_steps < 0:
            raise ValueError("pruner thresholds must be >= 0")
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def should_prune(
        self,
        step: int,
        value: float,
        completed_histories: list,
        higher_is_better: bool,
    ) -> bool:
        if step < self.n_warmup_steps:
            return False
        at_step = sorted(
            h[step] for h in completed_histories if step in h
        )
        if len(at_step) < self.n_startup_trials:
            return False
        n = len(at_step)
        # exact median: mean of the two middle order statistics
        median = (
            at_step[n // 2]
            if n % 2
            else (at_step[n // 2 - 1] + at_step[n // 2]) / 2.0
        )
        return value < median if higher_is_better else value > median


class _Trial:
    """Per-trial handle passed to objectives: ``report(value, step)``
    then ``should_prune()`` between training steps — exactly the
    optuna.Trial intermediate-value surface."""

    def __init__(self, pruner, completed_histories, higher_is_better):
        self._pruner = pruner
        self._histories = completed_histories
        self._higher = higher_is_better
        self.intermediate: dict = {}

    def report(self, value: float, step: int) -> None:
        self.intermediate[int(step)] = float(value)

    def should_prune(self) -> bool:
        if self._pruner is None or not self.intermediate:
            return False
        step = max(self.intermediate)
        return self._pruner.should_prune(
            step, self.intermediate[step], self._histories, self._higher
        )


class Study:
    """Trial ledger with JSON save/resume (the reference's
    ``storage``/``study_name`` persistence, minus the RDB): every
    trial records decoded params, the sampler-coordinate raws, the
    final value, completed/pruned state, and intermediate values.
    ``save(path)`` writes one JSON file; ``Study.load(path)`` resumes
    — a later ``optimize_objective(..., study=loaded)`` run seeds its
    TPE history with the stored trials and appends new ones."""

    def __init__(self, higher_is_better: bool = True, seed: Optional[int] = 42):
        self.higher_is_better = higher_is_better
        self.seed = seed
        self.trials: list = []

    def _completed(self) -> list:
        return [t for t in self.trials if t["state"] == "complete"]

    @property
    def best_trial(self) -> Optional[dict]:
        done = self._completed()
        if not done:
            return None
        return (max if self.higher_is_better else min)(
            done, key=lambda t: t["value"]
        )

    @property
    def best_params(self) -> Optional[dict]:
        best = self.best_trial
        return None if best is None else best["params"]

    @property
    def best_value(self) -> Optional[float]:
        best = self.best_trial
        return None if best is None else best["value"]

    def save(self, path: str) -> None:
        import json
        import os

        payload = json.dumps(
            {
                "higher_is_better": self.higher_is_better,
                "seed": self.seed,
                "trials": self.trials,
            },
            indent=1,
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "Study":
        import json

        with open(path) as fh:
            raw = json.loads(fh.read())
        study = cls(
            higher_is_better=raw["higher_is_better"], seed=raw["seed"]
        )
        study.trials = [
            {
                **t,
                "intermediate": {
                    int(k): v for k, v in (t.get("intermediate") or {}).items()
                },
            }
            for t in raw["trials"]
        ]
        return study


def optimize_objective(
    objective: Callable,
    param_borders: dict,
    budget: int = 10,
    higher_is_better: bool = True,
    seed: Optional[int] = 42,
    pruner: Optional[MedianPruner] = None,
    study: Optional[Study] = None,
    sampler=None,
) -> Study:
    """Generic sampler-driven loop over an arbitrary objective
    (TPE by default).

    ``objective(params, trial)`` returns the trial value; iterative
    objectives call ``trial.report(value, step)`` +
    ``trial.should_prune()`` between steps and raise
    :class:`TrialPruned` to abandon a bad trial early (its last
    reported value is recorded, state ``"pruned"``). Pass a
    :class:`Study` to RESUME: stored trials seed the sampler's
    history and ``budget`` counts only NEW trials; determinism under
    resume comes from re-seeding the sampler with
    ``seed + len(study.trials)``, so run→save→load→run reproduces a
    single longer run's trial-count trajectory without replaying old
    trials.

    ``sampler`` selects the search strategy: ``None`` → the vendored
    TPE; or a :class:`GridSampler` / :class:`RandomSampler` /
    :class:`CmaEsSampler` instance (each is ``bind()``-ed to the
    normalized space and study seed). A :class:`GridSampler` that
    exhausts its grid ends the loop early.
    """
    study = study or Study(higher_is_better=higher_is_better, seed=seed)
    norm = _normalize_space(param_borders)
    if sampler is None:
        sampler = _TPESampler(
            _sampler_space(norm), (seed or 0) + len(study.trials)
        )
    else:
        sampler.bind(
            norm, _sampler_space(norm), (seed or 0) + len(study.trials)
        )
    # TPE history: completed trials, plus pruned trials at their last
    # reported value (a pruned trial is evidence of a bad region)
    def _history() -> list:
        out = []
        for t in study.trials:
            if t["state"] == "complete":
                out.append({"params": t["raw"], "value": t["value"]})
            elif t["intermediate"]:
                out.append(
                    {
                        "params": t["raw"],
                        "value": t["intermediate"][max(t["intermediate"])],
                    }
                )
        return out

    def _full_history() -> list:
        # every trial, positionally stable (CmaEsSampler matches its
        # generation by position; GridSampler skips even pruned
        # points): value falls back to the last intermediate, None
        # when a pruned trial never reported
        out = []
        for t in study.trials:
            v = t["value"]
            if v is None and t["intermediate"]:
                v = t["intermediate"][max(t["intermediate"])]
            out.append({"params": t["raw"], "value": v})
        return out

    is_tpe = isinstance(sampler, _TPESampler)
    for _ in range(budget):
        try:
            raw = sampler.suggest(
                _history() if is_tpe else _full_history(),
                higher_is_better,
            )
        except GridExhausted:
            break
        params = _decode_params(norm, raw)
        completed_histories = [
            t["intermediate"]
            for t in study.trials
            if t["state"] == "complete" and t["intermediate"]
        ]
        trial = _Trial(pruner, completed_histories, higher_is_better)
        try:
            value = objective(params, trial)
            state = "complete"
        except TrialPruned:
            value = (
                trial.intermediate[max(trial.intermediate)]
                if trial.intermediate
                else None
            )
            state = "pruned"
        study.trials.append(
            {
                "params": params,
                "raw": raw,
                "value": value,
                "state": state,
                "intermediate": dict(trial.intermediate),
            }
        )
    return study


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
    study: Optional[Study] = None,
    **unsupported,
) -> dict:
    """Search ``param_borders`` for the best ``criterion`` value.

    ``model_factory(**params)`` builds a model; each trial runs
    fit → predict(k) → criterion(recs, test_interactions).
    Returns ``{"best_params", "best_value", "trials"}``.

    **Optuna-substitution boundary.** The supported surface is
    exactly this signature plus the two search-space formats
    (``{param: [low, high] | [choices...]}`` and the reference's
    ``{param: {"type": int|uniform|loguniform|loguniform_int|
    categorical, "args": [...]}}``). Median pruning and study
    persistence ARE covered — by this package's own
    :class:`MedianPruner` / :class:`Study` through
    :func:`optimize_objective` (fit→predict→metric trials are
    single-shot, so pruning only has meaning for iterative
    objectives that report intermediate values). OPTUNA-OBJECT knobs
    from the reference's mixin — custom optuna ``sampler``/``pruner``
    instances, RDB ``storage``/``study_name``, ``timeout``,
    callbacks, multivariate TPE flags — are NOT emulated and raise
    :class:`TypeError` immediately rather than being silently
    dropped (a ported call must fail loudly at the boundary, not
    appear to run with different semantics). When the real optuna IS
    importable, the loop still exposes only this subset;
    pass-through of optuna kwargs is deliberately not a feature, so
    behavior is identical with and without optuna installed.
    """
    if unsupported:
        raise TypeError(
            "optimize() does not support optuna-specific kwargs "
            f"{sorted(unsupported)}; supported kwargs: model_factory, "
            "train_dataset, test_dataset, param_borders, criterion, "
            "k, budget, higher_is_better, seed, study (see the docstring's "
            "Optuna-substitution boundary note)"
        )
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
    # (optuna_mixin.py:235-240): a caller asking for Optuna must know
    # what they got instead
    warnings.warn(
        "optuna is not installed: optimize() is using a vendored "
        "Parzen-estimator (TPE-style) sampler over the same search "
        "space and trial budget. Install optuna for the real "
        "TPESampler.",
        RuntimeWarning,
        stacklevel=2,
    )
    study = optimize_objective(
        lambda params, _trial: objective(params),
        param_borders,
        budget=budget,
        higher_is_better=higher_is_better,
        seed=seed,
        study=study,
    )
    return {
        "best_params": study.best_params,
        "best_value": study.best_value,
        "trials": trials,
        "study": study,
    }


class GridExhausted(Exception):
    """Raised by :class:`GridSampler` when every grid point has been
    tried — :func:`optimize_objective` stops early instead of
    re-evaluating points."""


class GridSampler:
    """Exhaustive deterministic sweep over an explicit grid — the
    optuna ``GridSampler`` equivalent (reference boundary:
    ``optuna_mixin.py`` accepts sampler objects; this package names
    them). ``search_space`` maps param → list of USER-SPACE values;
    points are visited in sorted-key cartesian-product order.
    Already-evaluated points (e.g. from a resumed :class:`Study`)
    are skipped by comparing sampler-space raws, so resume never
    repeats work. Raises :class:`GridExhausted` when done.
    """

    def __init__(self, search_space: dict):
        if not search_space:
            raise ValueError("GridSampler needs a non-empty search_space")
        for name, vals in search_space.items():
            if not isinstance(vals, (list, tuple)) or not vals:
                raise ValueError(
                    f"grid for {name!r} must be a non-empty list"
                )
        self.search_space = {k: list(v) for k, v in search_space.items()}

    def bind(self, norm: dict, space: dict, seed) -> None:
        import itertools

        self._norm = norm
        names = sorted(self.search_space)
        unknown = set(names) - set(norm)
        if unknown:
            raise ValueError(
                f"grid params {sorted(unknown)} not in param_borders"
            )
        self._points = [
            dict(zip(names, combo))
            for combo in itertools.product(
                *(self.search_space[n] for n in names)
            )
        ]
        self._cursor = 0

    def _encode(self, point: dict) -> dict:
        raw = {}
        for name, v in point.items():
            d = self._norm[name]
            if d[0] == "cat":
                raw[name] = v
            else:
                raw[name] = math.log(v) if d[4] else float(v)
        return raw

    def suggest(self, trials: list, higher_is_better: bool) -> dict:
        seen = [t["params"] for t in trials]
        while self._cursor < len(self._points):
            raw = self._encode(self._points[self._cursor])
            self._cursor += 1
            if raw not in seen:
                return raw
        raise GridExhausted(
            f"grid of {len(self._points)} points exhausted"
        )


class RandomSampler:
    """Uniform random search over the sampler space (log-transformed
    numeric coordinates, uniform categorical draws) — the optuna
    ``RandomSampler`` equivalent. Deterministic under ``seed``;
    ``seed=None`` inherits the study seed from
    :func:`optimize_objective`."""

    def __init__(self, seed: Optional[int] = None):
        self.seed = seed

    def bind(self, norm: dict, space: dict, seed) -> None:
        self._space = space
        self.rng = random.Random(self.seed if self.seed is not None else seed)

    def suggest(self, trials: list, higher_is_better: bool) -> dict:
        return _sample(self._space, self.rng)


class CmaEsSampler:
    """Covariance Matrix Adaptation Evolution Strategy (Hansen &
    Ostermeier 2001; Hansen 2016 tutorial arXiv:1604.00772) over the
    CONTINUOUS sampler space — the optuna ``CmaEsSampler``
    equivalent. Categorical params are rejected loudly (as optuna's
    does via independent sampling — we choose the explicit error).

    Generation-buffered: suggestions are drawn λ at a time from
    N(mean, σ²C); once the loop has evaluated the full generation
    (positionally — :func:`optimize_objective` appends every trial),
    the mean/paths/covariance update runs. All state lives in plain
    numpy on the driver; trials themselves are whatever the
    objective does (typically full distributed fit/predict runs).
    """

    def __init__(
        self,
        seed: Optional[int] = None,
        population_size: Optional[int] = None,
        sigma0: float = 0.3,
    ):
        self.seed = seed
        self.population_size = population_size
        self.sigma0 = sigma0

    def bind(self, norm: dict, space: dict, seed) -> None:
        import numpy as np

        cats = [n for n, d in norm.items() if d[0] == "cat"]
        if cats:
            raise ValueError(
                "CmaEsSampler supports only numeric params; "
                f"categorical: {cats} — use TPE or GridSampler"
            )
        self._names = sorted(space)
        self._lo = np.array([space[n][0] for n in self._names])
        self._hi = np.array([space[n][1] for n in self._names])
        n = len(self._names)
        self._rng = np.random.default_rng(
            self.seed if self.seed is not None else seed
        )
        lam = self.population_size or (4 + int(3 * math.log(n)))
        mu = lam // 2
        w = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
        w /= w.sum()
        self._lam, self._mu, self._w = lam, mu, w
        self._mueff = 1.0 / float(w @ w)
        # strategy parameters (Hansen 2016, eqs. 55-58)
        self._cc = (4 + self._mueff / n) / (n + 4 + 2 * self._mueff / n)
        self._cs = (self._mueff + 2) / (n + self._mueff + 5)
        self._c1 = 2 / ((n + 1.3) ** 2 + self._mueff)
        self._cmu = min(
            1 - self._c1,
            2 * (self._mueff - 2 + 1 / self._mueff)
            / ((n + 2) ** 2 + self._mueff),
        )
        self._damps = (
            1 + 2 * max(0.0, math.sqrt((self._mueff - 1) / (n + 1)) - 1)
            + self._cs
        )
        self._chiN = math.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n * n))
        # normalized coordinates: optimize in [0,1]^n, decode to bounds
        self._mean = np.full(n, 0.5)
        self._sigma = self.sigma0
        self._C = np.eye(n)
        self._pc = np.zeros(n)
        self._ps = np.zeros(n)
        self._gen_z: list = []      # sampled z vectors this generation
        self._gen_start = 0         # trial index where the gen began
        self._n = n

    def _decode(self, x) -> dict:
        span = self._hi - self._lo
        pt = self._lo + x * span
        return {n: float(v) for n, v in zip(self._names, pt)}

    def suggest(self, trials: list, higher_is_better: bool) -> dict:
        import numpy as np

        if len(self._gen_z) == self._lam:
            done = trials[self._gen_start:]
            if len(done) >= self._lam:
                self._update(done[: self._lam], higher_is_better)
                self._gen_z = []
                self._gen_start = len(trials)
        if not self._gen_z:
            self._gen_start = len(trials)
        A = np.linalg.cholesky(
            self._C + 1e-12 * np.eye(self._n)
        )
        z = self._rng.standard_normal(self._n)
        x = np.clip(self._mean + self._sigma * (A @ z), 0.0, 1.0)
        self._gen_z.append((x, z))
        return self._decode(x)

    def _update(self, gen_trials: list, higher_is_better: bool) -> None:
        import numpy as np

        vals = []
        for t in gen_trials:
            v = t["value"]
            vals.append(
                float("-inf" if higher_is_better else "inf")
                if v is None
                else v
            )
        order = np.argsort(vals)
        if higher_is_better:
            order = order[::-1]
        xs = np.array([self._gen_z[i][0] for i in order[: self._mu]])
        old_mean = self._mean
        self._mean = self._w @ xs
        y = (self._mean - old_mean) / self._sigma
        Cinv_sqrt = np.linalg.inv(
            np.linalg.cholesky(self._C + 1e-12 * np.eye(self._n))
        )
        self._ps = (1 - self._cs) * self._ps + math.sqrt(
            self._cs * (2 - self._cs) * self._mueff
        ) * (Cinv_sqrt @ y)
        hsig = float(
            np.linalg.norm(self._ps)
            / math.sqrt(1 - (1 - self._cs) ** (2 * (len(self._gen_z))))
            < (1.4 + 2 / (self._n + 1)) * self._chiN
        )
        self._pc = (1 - self._cc) * self._pc + hsig * math.sqrt(
            self._cc * (2 - self._cc) * self._mueff
        ) * y
        artmp = (xs - old_mean) / self._sigma
        self._C = (
            (1 - self._c1 - self._cmu) * self._C
            + self._c1
            * (
                np.outer(self._pc, self._pc)
                + (1 - hsig) * self._cc * (2 - self._cc) * self._C
            )
            + self._cmu * artmp.T @ np.diag(self._w) @ artmp
        )
        self._sigma *= math.exp(
            (self._cs / self._damps)
            * (np.linalg.norm(self._ps) / self._chiN - 1)
        )
        self._sigma = float(min(max(self._sigma, 1e-8), 1.0))


def _dominates(a: list, b: list, signs: list) -> bool:
    """True when objective vector ``a`` Pareto-dominates ``b`` under
    per-objective ``signs`` (+1 maximize, -1 minimize)."""
    ge_all = all(s * x >= s * y for x, y, s in zip(a, b, signs))
    gt_any = any(s * x > s * y for x, y, s in zip(a, b, signs))
    return ge_all and gt_any


def _nondominated_sort(values: list, signs: list) -> list:
    """NSGA-II fast non-dominated sort: returns front index per
    point (0 = Pareto-optimal)."""
    n = len(values)
    dominated_by = [0] * n
    dominates_set: list = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            if _dominates(values[i], values[j], signs):
                dominates_set[i].append(j)
                dominated_by[j] += 1
            elif _dominates(values[j], values[i], signs):
                dominates_set[j].append(i)
                dominated_by[i] += 1
    fronts = [0] * n
    current = [i for i in range(n) if dominated_by[i] == 0]
    rank = 0
    while current:
        nxt = []
        for i in current:
            fronts[i] = rank
            for j in dominates_set[i]:
                dominated_by[j] -= 1
                if dominated_by[j] == 0:
                    nxt.append(j)
        current = nxt
        rank += 1
    return fronts


def _crowding_distance(values: list, idxs: list) -> dict:
    """NSGA-II crowding distance within one front (Deb et al. 2002)."""
    dist = {i: 0.0 for i in idxs}
    if len(idxs) <= 2:
        return {i: float("inf") for i in idxs}
    m = len(values[idxs[0]])
    for k in range(m):
        ordered = sorted(idxs, key=lambda i: values[i][k])
        lo, hi = values[ordered[0]][k], values[ordered[-1]][k]
        dist[ordered[0]] = dist[ordered[-1]] = float("inf")
        span = hi - lo
        if span <= 0:
            continue
        for pos in range(1, len(ordered) - 1):
            dist[ordered[pos]] += (
                values[ordered[pos + 1]][k] - values[ordered[pos - 1]][k]
            ) / span
    return dist


class MOStudy:
    """Multi-objective trial ledger: trials carry a VALUES vector;
    ``best_trials`` is the Pareto-nondominated set (optuna's
    ``study.best_trials``). Same JSON save/resume shape as
    :class:`Study`."""

    def __init__(
        self, directions: tuple, seed: Optional[int] = 42
    ):
        for d in directions:
            if d not in ("max", "min"):
                raise ValueError(
                    f"direction must be 'max' or 'min', got {d!r}"
                )
        self.directions = tuple(directions)
        self.seed = seed
        self.trials: list = []

    @property
    def _signs(self) -> list:
        return [1 if d == "max" else -1 for d in self.directions]

    @property
    def best_trials(self) -> list:
        done = [t for t in self.trials if t["state"] == "complete"]
        if not done:
            return []
        fronts = _nondominated_sort(
            [t["values"] for t in done], self._signs
        )
        return [t for t, f in zip(done, fronts) if f == 0]

    def save(self, path: str) -> None:
        import json
        import os

        payload = json.dumps(
            {
                "directions": list(self.directions),
                "seed": self.seed,
                "trials": self.trials,
            },
            indent=1,
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "MOStudy":
        import json

        with open(path) as fh:
            raw = json.loads(fh.read())
        study = cls(
            directions=tuple(raw["directions"]), seed=raw["seed"]
        )
        study.trials = raw["trials"]
        return study


class _NSGA2Sampler:
    """NSGA-II variation operators as a sequential ask-loop (Deb et
    al. 2002, "A fast and elitist multiobjective genetic algorithm"):
    binary tournament on (front rank, crowding distance) over ALL
    evaluated trials, SBX crossover + polynomial mutation for numeric
    params in sampler space, uniform crossover + ε-random reset for
    categoricals. First ``n_startup`` suggestions are random. This is
    optuna's default multi-objective sampler class, re-derived from
    the paper."""

    def __init__(
        self,
        space: dict,
        signs: list,
        seed: Optional[int],
        n_startup: int = 8,
        eta: float = 20.0,
        mutation_rate: Optional[float] = None,
    ):
        self.space = space
        self.signs = signs
        self.rng = random.Random(seed)
        self.n_startup = n_startup
        self.eta = eta
        self.mutation_rate = mutation_rate or (
            1.0 / max(1, len(space))
        )

    def _tournament(self, trials, fronts, crowd) -> dict:
        i, j = self.rng.randrange(len(trials)), self.rng.randrange(
            len(trials)
        )
        if fronts[i] != fronts[j]:
            win = i if fronts[i] < fronts[j] else j
        else:
            win = i if crowd.get(i, 0.0) >= crowd.get(j, 0.0) else j
        return trials[win]["params"]

    def _sbx(self, x: float, y: float, lo: float, hi: float) -> float:
        # SBX child (one of the symmetric pair, chosen by coin flip)
        u = self.rng.random()
        beta = (
            (2 * u) ** (1 / (self.eta + 1))
            if u <= 0.5
            else (1 / (2 * (1 - u))) ** (1 / (self.eta + 1))
        )
        child = (
            0.5 * ((1 + beta) * x + (1 - beta) * y)
            if self.rng.random() < 0.5
            else 0.5 * ((1 - beta) * x + (1 + beta) * y)
        )
        return min(max(child, lo), hi)

    def _poly_mutate(self, x: float, lo: float, hi: float) -> float:
        if hi <= lo:
            return x
        u = self.rng.random()
        delta = (
            (2 * u) ** (1 / (self.eta + 1)) - 1
            if u < 0.5
            else 1 - (2 * (1 - u)) ** (1 / (self.eta + 1))
        )
        return min(max(x + delta * (hi - lo), lo), hi)

    def suggest(self, trials: list, _hib_unused=None) -> dict:
        done = [
            t
            for t in trials
            if t.get("values") is not None
        ]
        if len(done) < self.n_startup:
            return _sample(self.space, self.rng)
        fronts = _nondominated_sort(
            [t["values"] for t in done], self.signs
        )
        crowd: dict = {}
        by_front: dict = {}
        for i, f in enumerate(fronts):
            by_front.setdefault(f, []).append(i)
        vals = [t["values"] for t in done]
        for f, idxs in by_front.items():
            crowd.update(_crowding_distance(vals, idxs))
        p1 = self._tournament(done, fronts, crowd)
        p2 = self._tournament(done, fronts, crowd)
        child = {}
        for name, spec in self.space.items():
            if _is_range(spec):
                lo, hi = float(spec[0]), float(spec[1])
                v = self._sbx(float(p1[name]), float(p2[name]), lo, hi)
                if self.rng.random() < self.mutation_rate:
                    v = self._poly_mutate(v, lo, hi)
                child[name] = v
            else:
                choices = list(spec)
                v = p1[name] if self.rng.random() < 0.5 else p2[name]
                if self.rng.random() < self.mutation_rate:
                    v = self.rng.choice(choices)
                child[name] = v
        return child


def optimize_objective_multi(
    objective: Callable,
    param_borders: dict,
    directions: tuple,
    budget: int = 30,
    seed: Optional[int] = 42,
    study: Optional[MOStudy] = None,
) -> MOStudy:
    """Multi-objective search (optuna's
    ``create_study(directions=[...])`` equivalent): ``objective(
    params)`` returns a tuple/list of objective values, one per
    entry in ``directions`` (each ``"max"`` or ``"min"``). Candidate
    generation is NSGA-II (random startup, then tournament + SBX +
    polynomial mutation); ``study.best_trials`` is the Pareto
    front. Resume works like :func:`optimize_objective`: pass a
    loaded :class:`MOStudy` and ``budget`` new trials are appended
    with the sampler re-seeded by the stored trial count.
    """
    study = study or MOStudy(directions=directions, seed=seed)
    if tuple(study.directions) != tuple(directions):
        raise ValueError(
            f"study directions {study.directions} != {tuple(directions)}"
        )
    norm = _normalize_space(param_borders)
    space = _sampler_space(norm)
    sampler = _NSGA2Sampler(
        space, study._signs, (seed or 0) + len(study.trials)
    )

    def _history() -> list:
        return [
            {"params": t["raw"], "values": t["values"]}
            for t in study.trials
            if t["state"] == "complete"
        ]

    n_obj = len(directions)
    for _ in range(budget):
        raw = sampler.suggest(_history())
        params = _decode_params(norm, raw)
        values = list(objective(params))
        if len(values) != n_obj:
            raise ValueError(
                f"objective returned {len(values)} values for "
                f"{n_obj} directions"
            )
        study.trials.append(
            {
                "params": params,
                "raw": raw,
                "values": [float(v) for v in values],
                "state": "complete",
            }
        )
    return study
