"""Optuna HPO over all four implicit-feedback models, with 5-seed test
evaluation — protocol parity with
`/root/reference/examples/implicit-recsys/optuna_example.py` (search spaces
at its lines 30-50, 5-seed mean at 63-65).

Runs hermetically: when optuna is not installed, a built-in random-search
study with the same API subset (suggest_float incl. log scale) is used, and
``--dataset synthetic`` substitutes a generated implicit-feedback matrix for
MovieLens so no network/downloads are needed.  ``example_run_log.txt`` in
this directory is a captured run — the analogue of the reference's
committed ``optuna_example_log.txt``."""

import argparse

import numpy as np
import pandas as pd

import cymf_tpu as cymf

try:
    import optuna
except ImportError:  # hermetic fallback: random search, same API subset

    class _Trial:
        def __init__(self, rng):
            self.rng = rng
            self.params = {}

        def suggest_float(self, name, low, high, log=False):
            if log:
                v = float(np.exp(self.rng.uniform(np.log(low),
                                                  np.log(high))))
            else:
                v = float(self.rng.uniform(low, high))
            self.params[name] = v
            return v

    class _Study:
        def __init__(self, direction):
            self.sign = 1.0 if direction == "maximize" else -1.0
            self.best_value = -np.inf
            self.best_params = {}

        def optimize(self, objective, n_trials):
            rng = np.random.default_rng(0)
            for t in range(n_trials):
                trial = _Trial(rng)
                value = self.sign * objective(trial)
                print(f"[random-search] trial {t}: value={value:.6f} "
                      f"params={trial.params}")
                if value > self.best_value:
                    self.best_value = value
                    self.best_params = trial.params

    class optuna:  # noqa: N801 — minimal stand-in namespace
        @staticmethod
        def create_study(direction):
            return _Study(direction)

parser = argparse.ArgumentParser(description="")
parser.add_argument("--num_components", type=int, default=20)
parser.add_argument("--alpha", type=float, default=1e-3)
parser.add_argument("--max_epochs", type=int, default=300)
parser.add_argument("--num_threads", type=int, default=8)
parser.add_argument("--trials", type=int, default=10)
parser.add_argument("--dataset", type=str, default="ml-100k")
args = parser.parse_args()

if args.dataset == "synthetic":
    dataset = cymf.dataset.SyntheticImplicitDataset(
        num_user=600, num_item=400, rank=8, density=0.05, seed=42)
else:
    dataset = cymf.dataset.MovieLens(args.dataset)
valid_evaluator = cymf.evaluator.AverageOverAllEvaluator(
    dataset.valid, dataset.train, k=5, metrics=["DCG"])
test_evaluator = cymf.evaluator.AverageOverAllEvaluator(
    dataset.test, dataset.train, k=5)


def fit_and_score(model):
    model.fit(dataset.train, num_epochs=args.max_epochs,
              num_threads=args.num_threads,
              valid_evaluator=valid_evaluator, early_stopping=True,
              verbose=True)
    return valid_evaluator.evaluate(model.W, model.H)["DCG@5"]


def bpr_objective(trial):
    wd = trial.suggest_float("weight_decay", 1e-4, 1e-1, log=True)
    return fit_and_score(cymf.BPR(num_components=args.num_components,
                                  learning_rate=args.alpha,
                                  weight_decay=wd))


def expomf_objective(trial):
    wd = trial.suggest_float("weight_decay", 1e-4, 1e-1, log=True)
    return fit_and_score(cymf.ExpoMF(num_components=args.num_components,
                                     weight_decay=wd))


def wmf_objective(trial):
    wd = trial.suggest_float("weight_decay", 1e-4, 1e-1, log=True)
    weight = trial.suggest_float("weight", 1, 30, log=True)
    return fit_and_score(cymf.WMF(num_components=args.num_components,
                                  weight=weight, weight_decay=wd))


def relmf_objective(trial):
    wd = trial.suggest_float("weight_decay", 1e-4, 1e-1, log=True)
    clip = trial.suggest_float("clip_value", 0.1, 0.5)
    return fit_and_score(cymf.RelMF(num_components=args.num_components,
                                    learning_rate=args.alpha,
                                    weight_decay=wd, clip_value=clip))


def five_seed_eval(model):
    result = [test_evaluator.evaluate(model.W, model.H, seed=i)
              for i in range(5)]
    return dict(pd.DataFrame(result).describe().loc[["mean", "std"]]
                .T["mean"])


summary = {}

for name, objective, build in [
    ("RelMF", relmf_objective,
     lambda p: cymf.RelMF(num_components=args.num_components,
                          learning_rate=args.alpha,
                          clip_value=p["clip_value"])),
    ("BPR", bpr_objective,
     lambda p: cymf.BPR(num_components=args.num_components,
                        learning_rate=args.alpha,
                        weight_decay=p["weight_decay"])),
    ("ExpoMF", expomf_objective,
     lambda p: cymf.ExpoMF(num_components=args.num_components,
                           weight_decay=p["weight_decay"])),
    ("WMF", wmf_objective,
     lambda p: cymf.WMF(num_components=args.num_components,
                        weight_decay=p["weight_decay"],
                        weight=p["weight"])),
]:
    study = optuna.create_study(direction="maximize")
    study.optimize(objective, n_trials=args.trials)
    print(study.best_params)
    model = build(study.best_params)
    fit_and_score(model)
    summary[name] = five_seed_eval(model)
    print(summary[name])

print(pd.DataFrame(summary))
