"""FLOP/MFU accounting (cermvs_tpu/utils/flops.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cermvs_tpu.utils.flops import (compiled_flops, device_peak_flops,
                                    flops_of, mfu)


def test_matmul_flop_count():
    f = jax.jit(lambda a, b: (a @ b).sum())
    a = jnp.ones((128, 128), jnp.float32)
    fl = flops_of(f, a, a)
    assert fl is not None
    # 2*n^3 MACs dominate; the cost model adds the reduction
    assert 2 * 128**3 <= fl <= 2.2 * 128**3


def test_python_scalar_args_supported():
    """Non-array leaves (python floats — e.g. the train step's
    gradual_weight) must survive the abstract re-lowering path."""
    f = jax.jit(lambda a, s: (a @ a).sum() * s)
    a = jnp.ones((64, 64), jnp.float32)
    fl = flops_of(f, a, 0.5)
    assert fl is not None and fl >= 2 * 64**3


def test_peak_table_and_mfu():
    class FakeDev:
        device_kind = "TPU v5 lite"

    peak = device_peak_flops(FakeDev())
    assert peak == 197e12
    assert abs(mfu(197e12, 1.0, FakeDev()) - 1.0) < 1e-9
    assert device_peak_flops(jax.devices("cpu")[0]) is None  # unknown chip
    assert mfu(1e9, 1.0, jax.devices("cpu")[0]) is None


def test_flops_of_unlowerable_returns_none():
    assert flops_of(jax.jit(lambda x: x), object()) is None
    assert compiled_flops(object()) is None
