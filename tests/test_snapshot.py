"""Unit tests for the background snapshot writer (utils/snapshot.py).

The integration path (fit -> chunk callback -> snapshot -> resume) is
covered by tests/test_resume.py; these pin the writer's own contract:
latest-wins coalescing, durability at flush, and deferred errors.
"""

import os

import numpy as np
import pytest

from multimodal_umap_tpu.utils.snapshot import SnapshotWriter, to_host_memory

pytestmark = pytest.mark.fast


def test_latest_snapshot_wins_and_flush_is_durable(tmp_path):
    path = str(tmp_path / "snap.npz")
    w = SnapshotWriter()
    for epoch in range(5):
        w.submit(path, {"epoch": np.int64(epoch),
                        "x": np.full((4,), epoch, np.float32)})
    w.flush()
    snap = np.load(path)
    # Intermediate snapshots may coalesce; the LAST submitted must win.
    assert int(snap["epoch"]) == 4
    np.testing.assert_array_equal(snap["x"], np.full((4,), 4, np.float32))
    assert not os.path.exists(path + ".tmp.npz")


def test_write_error_surfaces_at_flush(tmp_path):
    w = SnapshotWriter()
    w.submit(str(tmp_path / "no_such_dir" / "snap.npz"),
             {"x": np.zeros((2,))})
    with pytest.raises(Exception):
        w.flush()
    # The error is consumed: the writer stays usable afterwards.
    good = str(tmp_path / "snap.npz")
    w.submit(good, {"x": np.ones((2,))})
    w.flush()
    np.testing.assert_array_equal(np.load(good)["x"], np.ones((2,)))


def test_to_host_memory_is_a_copy():
    import jax.numpy as jnp

    x = jnp.arange(8, dtype=jnp.float32)
    staged = to_host_memory(x)
    # The staged buffer must be independent of the input (donation
    # fence): deleting the source cannot invalidate it.
    x.delete()
    np.testing.assert_array_equal(
        np.asarray(staged), np.arange(8, dtype=np.float32))
