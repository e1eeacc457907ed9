"""Multi-host data sharding math (SURVEY §2.10; reference scope is one-host
DataParallel, pix2pix_trainer.py:23-26 — the TPU-native plan scales the same
global-batch recipe across processes over DCN).

These tests pin the host-side contract without needing multiple processes:
every process derives the IDENTICAL global batch order from opt.seed and
loads exactly its contiguous `process_shard` slice, so the concatenation of
all hosts' shards (in process order) reconstructs the single-host batch —
which is exactly what NamedSharding(P("data")) over a process-major device
mesh expects from make_array_from_process_local_data.
"""

import numpy as np
import pytest

from cocosnet_tpu import mesh as M
from cocosnet_tpu.config import test_defaults
from cocosnet_tpu.data.loader import DataLoader


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.array([i], np.float32)}


def _opt(batch, n_threads=1, serial=False, train=True):
    return test_defaults(dataset_mode="ade20k", batchSize=batch,
                         nThreads=n_threads, serial_batches=serial,
                         isTrain=train, seed=7)


def test_process_shard_math():
    assert M.process_shard(32, 0, 8) == (0, 4)
    assert M.process_shard(32, 3, 8) == (12, 4)
    assert M.process_shard(32, 7, 8) == (28, 4)
    assert M.process_shard(6, 1, 2) == (3, 3)
    with pytest.raises(ValueError):
        M.process_shard(6, 0, 4)


def test_host_shards_reassemble_global_batches():
    ds = _ToyDataset(41)  # ragged tail: 41 = 5*8 + 1
    opt = _opt(batch=8, train=True)

    global_batches = [b["idx"][:, 0]
                      for b in DataLoader(ds, opt, 0, 1)]
    per_host = [[b["idx"][:, 0] for b in DataLoader(ds, opt, pi, 4)]
                for pi in range(4)]

    assert all(len(h) == len(global_batches) for h in per_host)
    for step, gb in enumerate(global_batches):
        re = np.concatenate([per_host[pi][step] for pi in range(4)])
        np.testing.assert_array_equal(re, gb)
        for pi in range(4):
            assert per_host[pi][step].shape[0] == 2  # local batch


def test_multi_host_eval_pads_ragged_tail():
    """Eval keeps the tail single-host; multi-host pads it with duplicate
    items so every sample is still evaluated (a dropped tail would silently
    exclude up to batchSize-1 images from metrics); __len__ agrees with what
    iteration yields."""
    ds = _ToyDataset(10)
    opt = _opt(batch=4, train=False, serial=True)
    single = DataLoader(ds, opt, 0, 1)
    assert len(single) == 3 and len(list(single)) == 3  # 4+4+2
    hosts = [list(DataLoader(ds, opt, pi, 2)) for pi in range(2)]
    assert len(DataLoader(ds, opt, 0, 2)) == 3
    assert all(len(h) == 3 for h in hosts)
    covered = sorted(
        int(v) for h in hosts for b in h for v in b["idx"][:, 0])
    # all 10 samples present; the 2 pad slots duplicate items 0 and 1
    assert covered == [0, 0, 1, 1] + list(range(2, 10))
    for h in hosts:
        assert all(b["idx"].shape[0] == 2 for b in h)


def test_shard_batch_single_process_equals_plain_put():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = M.create_mesh(data=8)
    batch = {"x": np.arange(64, dtype=np.float32).reshape(16, 4)}
    out = M.shard_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
