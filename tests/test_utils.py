"""Profiling utilities and config tests."""

import time

import jax.numpy as jnp
import numpy as np

from cymf_tpu import config
from cymf_tpu.utils.profiling import Throughput, annotate


def test_throughput_counter():
    t = Throughput()
    assert t.tick(100) is None  # first tick establishes the clock
    time.sleep(0.01)
    rate = t.tick(100)
    assert rate is not None and rate > 0
    assert t.format().endswith("/s")


def test_throughput_format_scales():
    t = Throughput()
    t.rate = 2.5e6
    assert t.format() == "2.50M/s"
    t.rate = 3500.0
    assert t.format() == "3.5k/s"
    t.rate = 12.0
    assert t.format() == "12/s"


def test_annotate_context():
    with annotate("test-region"):
        _ = jnp.sum(jnp.ones(8))


def test_param_dtype_switch():
    assert config.param_dtype() == jnp.float32
    config.set_param_dtype(jnp.bfloat16)
    try:
        assert config.param_dtype() == jnp.bfloat16
    finally:
        config.set_param_dtype(jnp.float32)


def test_index_dtype():
    assert np.dtype(config.index_dtype) == np.int32
