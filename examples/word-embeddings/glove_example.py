"""GloVe on text8 — parity with the reference example
(`/root/reference/examples/word-embeddings/glove_example.py`)."""

import argparse

import cymf_tpu as cymf

parser = argparse.ArgumentParser(description="")
parser.add_argument("--language", type=str, default="en")
parser.add_argument("--min_count", type=int, default=5)
parser.add_argument("--window_size", type=int, default=10)
parser.add_argument("--num_epochs", type=int, default=15)
parser.add_argument("--num_components", type=int, default=50)
parser.add_argument("--lr", type=float, default=0.05)
parser.add_argument("--alpha", type=float, default=0.75)
parser.add_argument("--x_max", type=float, default=10.0)
parser.add_argument("--threads", type=int, default=8)
args = parser.parse_args()

print("loading text8...")
text8 = cymf.dataset.Text8(lang=args.language, min_count=args.min_count,
                           window_size=args.window_size)

model = cymf.GloVe(num_components=args.num_components, learning_rate=args.lr,
                   alpha=args.alpha, x_max=args.x_max)
model.fit(text8.X, num_epochs=args.num_epochs, num_threads=args.threads,
          verbose=True)
model.save_word2vec_format("./vectors.txt", text8.i2w)

try:
    from gensim.models import KeyedVectors
    w2v = KeyedVectors.load_word2vec_format("./vectors.txt")
    print("loaded into gensim:", len(w2v), "words")
except ImportError:
    print("gensim not installed; skipping load check")
