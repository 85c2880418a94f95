"""Reproduce the reference's ml-100k results table with cymf-tpu.

Mirrors the protocol of the reference README quickstart
(`/root/reference/README.md:56-68`) and the committed Optuna log's final
5-seed evaluation (`optuna_example_log.txt`): train each model on ml-100k
train with early stopping on valid DCG@5, then report the 5-seed mean of
test DCG@5 / Recall@5 / MAP@5.

Reference numbers to compare against (BASELINE.md):
  BPR    0.1896 / 0.2552 / 0.2266   (tuned)
  WMF    0.1867 / 0.2499 / 0.2217
  ExpoMF 0.1915 / 0.2577 / 0.2290
  RelMF  0.1929 / 0.2580 / 0.2315

Requires the real ml-100k files (auto-downloaded when network is available,
or provisioned under ~/.cymf_tpu/ml-100k).
"""

import argparse

import numpy as np
import pandas as pd

import cymf_tpu as cymf

parser = argparse.ArgumentParser()
parser.add_argument("--max_epochs", type=int, default=300)
parser.add_argument("--num_components", type=int, default=20)
parser.add_argument("--num_threads", type=int, default=8)
args = parser.parse_args()

dataset = cymf.dataset.MovieLens("ml-100k")
valid = cymf.AoaEvaluator(dataset.valid, dataset.train, metrics=["DCG"], k=5)
test = cymf.AoaEvaluator(dataset.test, dataset.train, k=5)

models = {
    "BPR": cymf.BPR(num_components=args.num_components, learning_rate=1e-3,
                    weight_decay=0.01),
    "WMF": cymf.WMF(num_components=args.num_components, weight_decay=0.01,
                    weight=10.0),
    "ExpoMF": cymf.ExpoMF(num_components=args.num_components,
                          weight_decay=0.01),
    "RelMF": cymf.RelMF(num_components=args.num_components,
                        learning_rate=1e-3, weight_decay=0.01,
                        clip_value=0.1),
}

summary = {}
for name, model in models.items():
    print(f"=== {name}")
    model.fit(dataset.train, num_epochs=args.max_epochs,
              num_threads=args.num_threads, valid_evaluator=valid,
              early_stopping=True, verbose=True)
    results = [test.evaluate(model.W, model.H, seed=i) for i in range(5)]
    summary[name] = dict(pd.DataFrame(results).mean())
    print(name, {k: round(v, 4) for k, v in summary[name].items()})

print()
print(pd.DataFrame(summary).T.round(4))
