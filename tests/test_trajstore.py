"""Trajectory store: native writer/reader round-trip, rotation, fallback parity."""

import numpy as np
import pytest

from gymnasium_planar_robotics_tpu.utils import trajstore


def test_native_lib_built():
    assert trajstore.native_available(), 'build with: make -C native/trajstore'


def test_roundtrip_and_shard_rotation(tmp_path):
    frames = [bytes([i]) * (1000 * (i + 1)) for i in range(20)]
    with trajstore.TrajWriter(tmp_path, shard_bytes=8000) as w:
        for f in frames:
            w.append(f)
    with trajstore.TrajReader(tmp_path) as r:
        assert len(r) == 20
        for i, f in enumerate(frames):
            assert r.get(i) == f
    # rotation actually happened
    shards = list(tmp_path.glob('shard_*.bin'))
    assert len(shards) > 1


def test_pytree_roundtrip(tmp_path):
    tree = {'obs': np.arange(12, dtype=np.float32).reshape(3, 4), 'rew': np.ones(3)}
    with trajstore.TrajWriter(tmp_path) as w:
        w.append_pytree(tree)
    with trajstore.TrajReader(tmp_path) as r:
        leaves = r.get_arrays(0)
    vals = {tuple(a.shape) for a in leaves if a.dtype != np.uint8}
    assert (3, 4) in vals and (3,) in vals


def test_python_fallback_format_compatible(tmp_path, monkeypatch):
    """Frames written by the pure-Python path must be readable by the native
    reader and vice versa (same on-disk format)."""
    frames = [b'hello', b'world' * 100]
    monkeypatch.setattr(trajstore, '_LIB', None)
    with trajstore.TrajWriter(tmp_path / 'py') as w:
        for f in frames:
            w.append(f)
    monkeypatch.undo()
    if not trajstore.native_available():
        pytest.skip('native lib not built')
    with trajstore.TrajReader(tmp_path / 'py') as r:
        assert len(r) == 2 and r.get(0) == b'hello' and r.get(1) == frames[1]


def test_writer_throughput_smoke(tmp_path):
    """Background thread keeps up with a fast producer."""
    payload = np.zeros(65536, dtype=np.uint8).tobytes()
    with trajstore.TrajWriter(tmp_path, shard_bytes=1 << 20) as w:
        for _ in range(200):
            w.append(payload)
    with trajstore.TrajReader(tmp_path) as r:
        assert len(r) == 200


def test_reopen_appends_correctly(tmp_path):
    """Reopening an existing store must resume offsets, not corrupt them."""
    with trajstore.TrajWriter(tmp_path) as w:
        w.append(b'first-run-frame')
    with trajstore.TrajWriter(tmp_path) as w:
        w.append(b'second-run-frame')
    assert w.frames_written == 2  # restored count + the new frame
    with trajstore.TrajReader(tmp_path) as r:
        assert len(r) == 2
        assert r.get(0) == b'first-run-frame'
        assert r.get(1) == b'second-run-frame'


def test_reopen_python_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(trajstore, '_LIB', None)
    with trajstore.TrajWriter(tmp_path) as w:
        w.append(b'aaa')
    with trajstore.TrajWriter(tmp_path) as w:
        w.append(b'bbbb')
    monkeypatch.undo()
    with trajstore.TrajReader(tmp_path) as r:
        assert len(r) == 2 and r.get(0) == b'aaa' and r.get(1) == b'bbbb'
