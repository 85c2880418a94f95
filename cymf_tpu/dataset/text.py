"""Corpus -> co-occurrence matrix builder (rebuild of ``read_text`` at
`/root/reference/cymf/glove.pyx:183-241`).

Exact semantics replicated:

* the whole file is read; newlines are replaced by ``<eos>`` tokens for the
  frequency count (`glove.pyx:198-200`), then the text is processed line by
  line;
* words with corpus frequency < ``min_count`` are dropped; vocabulary ids
  are assigned in first-seen order (`glove.pyx:205-219`);
* co-occurrence uses a **left window only** with ``1/distance`` weighting
  (`glove.pyx:223-226`), accumulated into a hash map keyed
  ``center + context * vocab_size``;
* result: ``scipy.csr_matrix`` of shape (V, V) plus the id->word map.

The accumulation is the hot host-side loop; a C++ native implementation
(``cymf_tpu.native``) is used when available, with this vectorized
numpy fallback (token-id windows + ``np.add.at`` into a dict-free COO
aggregation) otherwise.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Tuple

import numpy as np
from scipy import sparse


def _python_cooccurrence(lines_ids, vocab_size: int, window_size: int):
    """Vectorized accumulation: for each line, pairs (j, k) with
    k in [j-window, j) get weight 1/(j-k).  Aggregated per line with numpy,
    merged across lines via sorted unique keys."""
    keys_all = []
    vals_all = []
    for ids in lines_ids:
        n = len(ids)
        if n < 2:
            continue
        ids = np.asarray(ids, dtype=np.int64)
        js = []
        ks = []
        ws = []
        for d in range(1, min(window_size, n - 1) + 1):
            js.append(ids[d:])
            ks.append(ids[:-d])
            ws.append(np.full(n - d, 1.0 / d))
        j = np.concatenate(js)
        k = np.concatenate(ks)
        w = np.concatenate(ws)
        key = j + k * vocab_size
        keys_all.append(key)
        vals_all.append(w)
    if not keys_all:
        return np.zeros(0, np.int64), np.zeros(0)
    keys = np.concatenate(keys_all)
    vals = np.concatenate(vals_all)
    ukeys, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(ukeys))
    np.add.at(sums, inv, vals)
    return ukeys, sums


def read_text(fname: str, min_count: int = 5, window_size: int = 10
              ) -> Tuple[sparse.csr_matrix, Dict[int, str]]:
    with open(fname) as f:
        raw = f.read()
    count = dict(Counter(raw.replace("\n", "<eos>").split(" ")))
    lines = raw.split("\n")

    w2i: Dict[str, int] = {}
    i2w: Dict[int, str] = {}
    lines_ids = []
    for line in lines:
        ids = []
        for word in line.split(" "):
            if count.get(word, 0) >= min_count:
                if word not in w2i:
                    idx = len(w2i)
                    w2i[word] = idx
                    i2w[idx] = word
                ids.append(w2i[word])
        lines_ids.append(ids)

    vocab_size = len(w2i)

    try:
        from ..native import cooccurrence as _native_cooc
        keys, vals = _native_cooc(lines_ids, vocab_size, window_size)
    except Exception:
        keys, vals = _python_cooccurrence(lines_ids, vocab_size, window_size)

    row = (keys % vocab_size).astype(np.int64)  # center word
    col = (keys // vocab_size).astype(np.int64)  # context word
    X = sparse.csr_matrix((vals, (row, col)),
                          shape=(vocab_size, vocab_size))
    return X, i2w
