"""C++ async trajectory recorder tests (runtime/)."""

import numpy as np
import pytest


def test_recorder_roundtrip(tmp_path):
    from pointfoot_tpu.runtime import TrajectoryRecorder, read_log

    path = str(tmp_path / "run.tlog")
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 27)).astype(np.float32)
    with TrajectoryRecorder(path, record_size=27, capacity=128) as rec:
        for i in range(100):
            assert rec.push(data[i])
        n = rec.push_batch(data[100:500])
        rec.flush()
        written = rec.written
        dropped = rec.dropped
    assert written + dropped == 100 + n + (400 - n)
    out, rs = read_log(path)
    assert rs == 27
    assert out.shape[0] == written
    # every written record is one of the source rows, in order
    np.testing.assert_array_equal(out[:100], data[:100])


def test_recorder_nonblocking_under_overflow(tmp_path):
    """A tiny ring must drop rather than block when the producer outruns
    the writer thread."""
    from pointfoot_tpu.runtime import TrajectoryRecorder, read_log

    path = str(tmp_path / "over.tlog")
    row = np.zeros(8, np.float32)
    with TrajectoryRecorder(path, record_size=8, capacity=4) as rec:
        import time

        t0 = time.perf_counter()
        for _ in range(20000):
            rec.push(row)
        elapsed = time.perf_counter() - t0
        rec.flush()
        total = rec.written + rec.dropped
    assert total == 20000
    assert elapsed < 2.0  # never blocked
    out, _ = read_log(path)
    assert out.shape[0] == total - (total - out.shape[0])


def test_reader_rejects_garbage(tmp_path):
    from pointfoot_tpu.runtime import read_log

    p = tmp_path / "bad.tlog"
    p.write_bytes(b"not a tlog file at all")
    with pytest.raises(ValueError):
        read_log(str(p))
