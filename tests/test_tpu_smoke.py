"""Opt-in smoke tests on the real TPU chip (JATSR_RUN_TPU=1).

The main suite forces CPU (conftest).  These validate the device-only
paths — Pallas kernel compilation under Mosaic tiling rules and the int8
MXU path — which interpret mode cannot check (see
memory: pallas interpret does not enforce Mosaic constraints).

Run:  JATSR_RUN_TPU=1 python -m pytest tests/test_tpu_smoke.py -q
(note: conftest still pins cpu; this module re-selects the TPU itself)
"""

import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("JATSR_RUN_TPU"),
    reason="real-TPU smoke tests; set JATSR_RUN_TPU=1",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    jax.config.update("jax_platforms", "")  # release the cpu pin
    try:
        devs = jax.devices("tpu")
    except RuntimeError:
        pytest.skip("no TPU available")
    return devs[0]


def test_pallas_attention_compiles_on_tpu(tpu):
    import jax
    import jax.numpy as jnp

    from jatsr_tpu.ops.attention import gqa_attention

    rs = np.random.RandomState(0)
    with jax.default_device(tpu):
        q = jnp.asarray(rs.randn(2, 345, 4, 64), jnp.bfloat16)
        k = jnp.asarray(rs.randn(2, 345, 2, 64), jnp.bfloat16)
        v = jnp.asarray(rs.randn(2, 345, 2, 64), jnp.bfloat16)
        out = gqa_attention(q, k, v, interpret=False)
        assert out.shape == (2, 345, 4, 64)
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_int8_model_forward_on_tpu(tpu):
    import jax
    import jax.numpy as jnp

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT

    base = get_preset("tiny").model
    cfg = dataclasses.replace(base, dropout=0.0, matmul_precision="int8")
    with jax.default_device(tpu):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 64, 1024))
        t = jnp.full((1,), 0.5)
        params = DiT(cfg).init({"params": key, "dropout": key}, x, t, x)[
            "params"
        ]
        out = DiT(cfg).apply({"params": params}, x, t, x)
        assert bool(jnp.isfinite(out).all())
