"""Unit tests for the parallel AOT precompile pool
(utils/precompile.py) and the setup-round autotune store."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from multigridsolver_tpu.utils import precompile as pool


@partial(jax.jit, static_argnames=("scale",))
def _f(x, scale: float = 1.0):
    return jnp.sum(x) * scale, x * 2


class TestPool:
    def test_warm_then_call_uses_aot(self):
        x = jnp.arange(8, dtype=jnp.float32)
        before = pool.stats["hit"]
        pool.warm(_f, jax.ShapeDtypeStruct((8,), jnp.float32), scale=3.0)
        pool.barrier()
        s, d = pool.call(_f, x, scale=3.0)
        assert pool.stats["hit"] == before + 1
        assert float(s) == pytest.approx(float(jnp.sum(x)) * 3.0)
        np.testing.assert_array_equal(np.asarray(d), np.asarray(x) * 2)

    def test_call_without_warm_falls_back(self):
        x = jnp.ones((4,), jnp.float32)
        before = pool.stats["miss"]
        s, _ = pool.call(_f, x, scale=5.0)
        assert pool.stats["miss"] == before + 1
        assert float(s) == pytest.approx(4.0 * 5.0)

    def test_distinct_shapes_are_distinct_entries(self):
        pool.warm(_f, jax.ShapeDtypeStruct((16,), jnp.float32), scale=1.0)
        pool.warm(_f, jax.ShapeDtypeStruct((32,), jnp.float32), scale=1.0)
        pool.barrier()
        s16, _ = pool.call(_f, jnp.ones((16,), jnp.float32), scale=1.0)
        s32, _ = pool.call(_f, jnp.ones((32,), jnp.float32), scale=1.0)
        assert float(s16) == 16.0 and float(s32) == 32.0

    def test_statics_participate_in_key(self):
        x = jnp.ones((8,), jnp.float32)
        pool.warm(_f, jax.ShapeDtypeStruct((8,), jnp.float32), scale=2.0)
        pool.barrier()
        s, _ = pool.call(_f, x, scale=7.0)   # different static → miss ok
        assert float(s) == pytest.approx(8.0 * 7.0)


class TestRoundTune:
    def test_tune_roundtrip(self, tmp_path, monkeypatch):
        from multigridsolver_tpu.setup import aggregation as agg
        monkeypatch.setenv("MGS_CACHE_DIR", str(tmp_path))
        # exclude the shipped warm-set tunes: this test round-trips the
        # machine-local store only
        monkeypatch.setenv("MGS_NO_WARMSET", "1")
        monkeypatch.setattr(agg, "_ROUND_TUNE", {})
        monkeypatch.setattr(agg, "_TUNE_LOADED", False)
        agg._ROUND_TUNE[(1024, 5, 16, 1024)] = {"wr_g": 32, "wr_c1": 24,
                                                "wr_g2": 24}
        agg._tune_save()
        agg._ROUND_TUNE.clear()
        agg._tune_load()
        assert agg._ROUND_TUNE == {
            (1024, 5, 16, 1024): {"wr_g": 32, "wr_c1": 24, "wr_g2": 24}}
