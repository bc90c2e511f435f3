"""Multi-device sharding on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from oclcomputervision_tpu import parallel
from oclcomputervision_tpu.ops import histeq as ops_histeq


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh((8,), ("data",))


class TestDataParallel:
    def test_batched_histeq_matches_single(self, mesh8, under_exposure_gray):
        g = under_exposure_gray[:256, :256]
        batch = np.stack([np.roll(g, i, axis=0) for i in range(8)])
        fn = parallel.data_parallel(
            lambda b: ops_histeq.histeq_global(b), mesh8, "data"
        )
        got = np.asarray(jax.jit(fn)(batch))
        for i in range(8):
            want = np.asarray(ops_histeq.histeq_global(batch[i]))
            np.testing.assert_array_equal(got[i], want)


class TestSpatialSharding:
    def test_row_sharded_histeq_matches_single_device(self, mesh8, under_exposure_gray):
        g = under_exposure_gray[:512, :1024]  # 512 rows / 8 devices
        got = np.asarray(parallel.histeq_global_sharded(g, mesh8))
        want = np.asarray(ops_histeq.histeq_global(g))
        np.testing.assert_array_equal(got, want)


class TestDistributedTraining:
    def test_raisr_train_step_matches_single_device(self, mesh8, lenna_gray):
        from oclcomputervision_tpu.models import raisr as mr
        from oclcomputervision_tpu.utils.config import RaisrConfig
        import jax.numpy as jnp

        mesh = parallel.make_mesh((4, 2), ("dp", "tp"))
        cfg = RaisrConfig()
        y01 = jnp.asarray(lenna_gray[:64, :64].astype(np.float32) / 255.0)
        p, t, f = mr._training_arrays(y01, cfg)

        dist = parallel.raisr_train_step(
            p, t, f, cfg.num_filters, cfg.filter_len, mesh, chunk=256
        )
        g, r, c = mr.accumulate_normal_eq(p, t, f, cfg.num_filters, 256)
        single = mr.solve_filters(g, r, c, cfg.filter_len)
        # accumulation order differs across shards: fp32-tolerance match
        np.testing.assert_allclose(
            np.asarray(dist), np.asarray(single), atol=5e-3, rtol=1e-2
        )


class TestShardedRaisr:
    def test_row_sharded_matches_single_device(self, mesh8, lenna_gray):
        import jax.numpy as jnp

        from oclcomputervision_tpu.models.raisr import train_filters
        from oclcomputervision_tpu.ops.raisr import raisr_upsample
        from oclcomputervision_tpu.parallel.mesh import raisr_upsample_sharded
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        hr = lenna_gray[:128, :128]
        filters = train_filters([hr], cfg, chunk=512)
        lr = hr[::2, ::2].copy()  # any uint8 input works

        single = np.asarray(raisr_upsample(lr, filters, cfg))
        sharded = np.asarray(
            raisr_upsample_sharded(jnp.asarray(lr), filters, cfg, mesh8)
        )
        assert sharded.shape == single.shape
        # interior seams must be bit-identical; global rows match too
        # because edge shards replicate their own boundary rows
        np.testing.assert_array_equal(sharded, single)
