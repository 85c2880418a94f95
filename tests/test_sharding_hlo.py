"""Compile-time proof of multi-chip compute partitioning (VERDICT r1 #3).

Compiles the explicit shard_map BPR epoch on the 8-device CPU mesh and
asserts, from the compiled HLO:

* no collective ever moves a table-sized payload — all comm is O(batch);
* per-device FLOPs shrink with mesh size (the gradient work is actually
  partitioned, not replicated).

These tests fail if the partitioning ever regresses to XLA choosing a
replicated-compute or table-gathering strategy.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cymf_tpu.ops.hashset import build_pair_hashset
from cymf_tpu.optim import Adam
from cymf_tpu.parallel import MeshContext
from cymf_tpu.parallel.shard_step import sharded_bpr_epoch

U, I, K, B, S = 1024, 512, 16, 256, 2

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
                "collective-permute")


def _compiled_text(n_devices):
    mesh = MeshContext.create(jax.devices()[:n_devices])
    opt = Adam(0.001)
    rng = np.random.default_rng(0)
    W = mesh.put_table(jnp.asarray(rng.normal(size=(U, K)), jnp.float32))
    H = mesh.put_table(jnp.asarray(rng.normal(size=(I, K)), jnp.float32))
    ow, oh = opt.init(W), opt.init(H)
    u = jax.device_put(jnp.asarray(rng.integers(0, U, (S, B)), jnp.int32),
                       mesh.batch2d())
    i = jax.device_put(jnp.asarray(rng.integers(0, I, (S, B)), jnp.int32),
                       mesh.batch2d())
    hs = jax.tree_util.tree_map(
        mesh.put_replicated, build_pair_hashset(
            np.arange(U, dtype=np.int64), np.zeros(U, np.int64)))
    fn = sharded_bpr_epoch(mesh, opt, 0.01, U, I)
    lowered = fn.lower(W, H, ow, oh, u, i, hs, jnp.asarray(S * B, jnp.int32),
                       jax.random.PRNGKey(0))
    compiled = lowered.compile()
    return compiled


@pytest.fixture(scope="module")
def compiled8():
    assert len(jax.devices()) >= 8
    return _compiled_text(8)


def test_no_table_sized_collectives(compiled8):
    """Every collective payload must be batch-sized (< table size)."""
    text = compiled8.as_text()
    table_elems = U * K  # smallest table-sized payload we must never move
    offenders = []
    for line in text.splitlines():
        if not any(c in line for c in _COLLECTIVES):
            continue
        for shape in re.findall(r"[a-z0-9]+\[([0-9,]+)\]", line):
            dims = [int(d) for d in shape.split(",") if d]
            elems = int(np.prod(dims)) if dims else 1
            if elems >= table_elems:
                offenders.append(line.strip()[:160])
    assert not offenders, "table-sized collectives found:\n" + \
        "\n".join(offenders)


def test_collectives_present(compiled8):
    """Sanity: the explicit exchange really compiled to collectives."""
    text = compiled8.as_text()
    assert any(c in text for c in ("all-gather", "all-to-all")), \
        "expected explicit row-exchange collectives in the HLO"
    assert "reduce-scatter" in text or "all-reduce" in text


def test_per_device_flops_shrink_with_mesh(compiled8):
    """The per-device compiled module must do ~1/n of the 1-device FLOPs
    for the partitioned stages (gradient math dominates at these shapes)."""
    c1 = _compiled_text(1)
    f1 = c1.cost_analysis()["flops"]
    f8 = compiled8.cost_analysis()["flops"]
    assert f8 < 0.55 * f1, (f1, f8)
