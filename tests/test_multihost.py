"""Multi-host scaffolding (parallel/multihost.py): the mesh/slice shape
math, tested single-process (a real pod cannot run here — SURVEY §2.4;
the multi-process branches are exercised with a fake process view)."""
import numpy as np
import pytest

import jax

from quadraturefields_tpu.parallel import multihost as mh


def test_maybe_initialize_noop_single_host(monkeypatch):
    monkeypatch.delenv("QF_COORDINATOR", raising=False)
    monkeypatch.delenv("QF_NUM_PROCESSES", raising=False)
    assert mh.maybe_initialize_distributed() is False


def test_maybe_initialize_runs_before_backend_queries(monkeypatch):
    """With an explicit coordinator config, jax.distributed.initialize
    must be the FIRST jax call — jax.process_count() instantiates and
    caches the XLA backend, after which initialize() always raises
    (ADVICE r4 high, reproduced upstream)."""
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append(("init", kw)),
    )

    def _booby_trapped_process_count():
        raise AssertionError(
            "backend queried before jax.distributed.initialize"
        )

    monkeypatch.setattr(jax, "process_count", _booby_trapped_process_count)
    monkeypatch.setattr(mh, "_INITIALIZED", False)
    assert mh.maybe_initialize_distributed(
        coordinator_address="10.0.0.1:1234", num_processes=4,
        process_id=1,
    )
    assert calls and calls[0][0] == "init"
    assert calls[0][1]["num_processes"] == 4
    # idempotent: second call does not re-initialize
    assert mh.maybe_initialize_distributed()
    assert len(calls) == 1
    monkeypatch.setattr(mh, "_INITIALIZED", False)


def test_put_process_batch_single_process():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mh.make_global_mesh(8)
    sharding = NamedSharding(mesh, P("data"))
    o = np.random.default_rng(0).normal(size=(512, 3)).astype(np.float32)
    p = np.random.default_rng(1).normal(size=(512, 3)).astype(np.float32)
    ao, ap = mh.put_process_batch((o, p), mesh, sharding)
    np.testing.assert_allclose(np.asarray(ao), o)
    np.testing.assert_allclose(np.asarray(ap), p)
    assert len(ao.sharding.device_set) == 8


def test_put_process_batch_multiprocess_slices(monkeypatch):
    """In a fake 4-process view, each process must hand its LOCAL slice
    to make_array_from_process_local_data — never device_put the full
    global batch (ADVICE r4 medium)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mh.make_global_mesh(8)
    sharding = NamedSharding(mesh, P("data"))
    o = np.arange(1024 * 3, dtype=np.float32).reshape(1024, 3)
    handed = []

    def fake_make(shd, local, global_shape):
        handed.append((np.asarray(local), global_shape))
        return local

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    monkeypatch.setattr(
        jax, "make_array_from_process_local_data", fake_make
    )
    # give the real mesh devices a fake process split: 2 devices/proc
    for i, d in enumerate(mesh.devices.flat):
        monkeypatch.setattr(
            type(d), "process_index", property(lambda s, i=i: 0),
            raising=False,
        )
    # process_local_slice consults device.process_index; patch at the
    # helper level instead to keep real Device objects untouched
    monkeypatch.setattr(
        mh, "process_local_slice", lambda n, m, axis="data": (512, 256)
    )
    (arr,) = mh.put_process_batch((o,), mesh, sharding)
    assert len(handed) == 1
    local, gshape = handed[0]
    np.testing.assert_allclose(local, o[512:768])
    assert gshape == (1024, 3)


def test_make_global_mesh_shapes():
    mesh = mh.make_global_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    mesh4 = mh.make_global_mesh(4)
    assert mesh4.devices.size == 4
    with pytest.raises(ValueError):
        mh.make_global_mesh(1024)


def test_process_local_slice_single_process():
    mesh = mh.make_global_mesh(8)
    start, size = mh.process_local_slice(1024, mesh)
    assert (start, size) == (0, 1024)
    with pytest.raises(ValueError):
        mh.process_local_slice(1001, mesh)  # not divisible by 8


def test_global_ray_batch_single_process():
    mesh = mh.make_global_mesh(8)
    o = np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32)
    (arr,) = mh.global_ray_batch([o], 256, mesh)
    assert arr.shape == (256, 3)
    np.testing.assert_allclose(np.asarray(arr), o)
    # sharded over the mesh leading axis
    assert len(arr.sharding.device_set) == 8


class _FakeDev:
    def __init__(self, pid):
        self.process_index = pid

    def __repr__(self):
        return f"dev(p{self.process_index})"


def test_mesh_device_grid_multiprocess_validation(monkeypatch):
    """4 processes x 2 devices: whole-process prefixes allowed, ragged
    truncation rejected (it would deadlock collectives on a pod)."""
    devs = [_FakeDev(p) for p in range(4) for _ in range(2)]
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert len(mh.mesh_device_grid(4, devices=devs)) == 4
    assert len(mh.mesh_device_grid(8, devices=devs)) == 8
    with pytest.raises(ValueError):
        mh.mesh_device_grid(3, devices=devs)
    with pytest.raises(ValueError):
        mh.mesh_device_grid(9, devices=devs)


def test_process_local_slice_multiprocess(monkeypatch):
    """Each fake process owns the contiguous run of its devices'
    shards; together they tile [0, global_n) exactly."""

    class _FakeMesh:
        def __init__(self, devs):
            self.devices = np.asarray(devs, dtype=object)

    devs = [_FakeDev(p) for p in range(4) for _ in range(2)]
    mesh = _FakeMesh(devs)
    seen = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        start, size = mh.process_local_slice(1024, mesh)
        assert size == 1024 // 4
        seen.append((start, size))
    covered = sorted(seen)
    assert covered == [(0, 256), (256, 256), (512, 256), (768, 256)]
