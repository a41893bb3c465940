"""Prefetch pipeline tests."""
import numpy as np
import jax

from cdgvae_tpu.data.prefetch import prefetch_batches


def test_prefetch_yields_all_full_batches_on_device():
    x = np.arange(100, dtype=np.float32).reshape(50, 2)
    y = np.arange(50, dtype=np.float32)
    rng = np.random.default_rng(0)
    seen = []
    for xb, yb in prefetch_batches((x, y), batch_size=16, rng=rng):
        assert xb.shape == (16, 2) and yb.shape == (16,)
        assert isinstance(xb, jax.Array)
        # x/y stay index-aligned through the shuffle
        np.testing.assert_array_equal(np.asarray(xb[:, 0]),
                                      np.asarray(yb) * 2)
        seen.extend(np.asarray(yb).tolist())
    assert len(seen) == 48  # 3 full batches, remainder dropped
    assert len(set(seen)) == 48  # no duplicates


def test_prefetch_early_exit_does_not_hang():
    x = np.zeros((1000, 4), dtype=np.float32)
    rng = np.random.default_rng(0)
    it = prefetch_batches((x,), batch_size=8, rng=rng, prefetch=2)
    next(it)
    it.close()  # generator close must not deadlock the producer


def test_prefetch_propagates_producer_errors():
    """A producer-thread failure (bad index / transfer error) raises in the
    consumer instead of silently truncating the epoch."""
    import numpy as np
    import pytest
    from cdgvae_tpu.data.prefetch import prefetch_batches

    class Boom:
        def __len__(self):
            return 64

        def __getitem__(self, idx):
            raise RuntimeError("transfer exploded")

    rng = np.random.default_rng(0)
    with pytest.raises(RuntimeError, match="transfer exploded"):
        for _ in prefetch_batches([Boom()], 16, rng):
            pass


def test_prefetch_abandoned_consumer_does_not_leak_thread():
    """Breaking out of the loop with prefetch=1 lets the producer exit
    (no forever-blocked sentinel put)."""
    import threading
    import time
    import numpy as np
    from cdgvae_tpu.data.prefetch import prefetch_batches

    rng = np.random.default_rng(0)
    x = np.arange(640, dtype=np.float32).reshape(64, 10)
    before = threading.active_count()
    for _ in range(5):
        for batch in prefetch_batches([x], 8, rng, prefetch=1):
            break  # abandon mid-epoch
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1
