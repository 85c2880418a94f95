"""Optuna HPO over all four implicit-feedback models, with 5-seed test
evaluation — protocol parity with
`/root/reference/examples/implicit-recsys/optuna_example.py` (search spaces
at its lines 30-50, 5-seed mean at 63-65)."""

import argparse

import numpy as np
import pandas as pd

import cymf_tpu as cymf

try:
    import optuna
except ImportError as e:  # optuna is optional in this environment
    raise SystemExit("optuna is required for this example") from e

parser = argparse.ArgumentParser(description="")
parser.add_argument("--num_components", type=int, default=20)
parser.add_argument("--alpha", type=float, default=1e-3)
parser.add_argument("--max_epochs", type=int, default=300)
parser.add_argument("--num_threads", type=int, default=8)
parser.add_argument("--trials", type=int, default=10)
parser.add_argument("--dataset", type=str, default="ml-100k")
args = parser.parse_args()

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
