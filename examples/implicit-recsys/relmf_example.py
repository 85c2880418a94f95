"""RelMF on MovieLens — parity with the reference example."""

import argparse

import cymf_tpu as cymf

parser = argparse.ArgumentParser(description="")
parser.add_argument("--max_epochs", type=int, default=300)
parser.add_argument("--num_components", type=int, default=20)
parser.add_argument("--learning_rate", type=float, default=1e-3)
parser.add_argument("--weight_decay", type=float, default=1e-2)
parser.add_argument("--clip_value", type=float, default=0.1)
parser.add_argument("--num_threads", type=int, default=8)
parser.add_argument("--dataset", type=str, default="ml-100k")
args = parser.parse_args()

dataset = cymf.dataset.MovieLens(args.dataset)
valid_evaluator = cymf.evaluator.AverageOverAllEvaluator(
    dataset.valid, dataset.train, metrics=["DCG"], k=5)
test_evaluator = cymf.evaluator.UnbiasedEvaluator(
    dataset.test, dataset.train, k=5)
model = cymf.RelMF(num_components=args.num_components,
                   learning_rate=args.learning_rate,
                   weight_decay=args.weight_decay,
                   clip_value=args.clip_value)
model.fit(dataset.train, num_epochs=args.max_epochs,
          num_threads=args.num_threads, valid_evaluator=valid_evaluator,
          early_stopping=True)
print(test_evaluator.evaluate(model.W, model.H))
