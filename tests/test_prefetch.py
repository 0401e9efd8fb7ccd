"""Host->device prefetch iterator (data/prefetch.py)."""

import numpy as np
import pytest

import jax

from avsl_tpu.data.prefetch import prefetch_to_device


def _batches(n):
    for i in range(n):
        yield {"x": np.full((8, 4), i, np.float32), "i": np.full((8,), i)}


def test_order_and_device_residency():
    out = list(prefetch_to_device(_batches(5), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(np.asarray(b["i"])[0]) == i  # order preserved
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), i)


def test_source_errors_propagate():
    def bad():
        yield {"x": np.zeros(3, np.float32)}
        raise RuntimeError("decode failed")

    it = prefetch_to_device(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_mesh_sharded_prefetch():
    from avsl_tpu.core.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh(8)
    out = list(prefetch_to_device(_batches(3), size=2, mesh=mesh))
    assert len(out) == 3
    shard_axes = out[0]["x"].sharding.spec
    assert shard_axes and shard_axes[0] == DATA_AXIS


def test_abandoned_consumer_releases_producer():
    import threading
    import time

    before = threading.active_count()
    it = prefetch_to_device(_batches(100), size=1)
    next(it)
    it.close()  # abandon mid-stream
    time.sleep(0.6)
    assert threading.active_count() <= before + 1  # producer exited
