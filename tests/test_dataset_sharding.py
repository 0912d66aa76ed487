"""Per-host dataset sharding (SURVEY §2.5): simulated multi-process epoch —
the hosts' strided slices must be disjoint, cover the epoch, and stay aligned
when every host shuffles with the same seed (the reference's only distributed
pattern, tools/distributed_transcribe/transcribe.py:109)."""

import numpy as np

from unitspeech_tpu.data.dataset import iterate_batches


class _IdxDataset:
    """Dataset of ints; the 'collator' records which indices formed a batch."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i


def _collate(items):
    return list(items)


def _epoch(n, batch_size, world, seed=7, drop_last=True):
    per_host = {}
    for rank in range(world):
        rng = np.random.default_rng(seed)  # identical seed on every host
        per_host[rank] = list(
            iterate_batches(
                _IdxDataset(n), _collate, batch_size, key=rng,
                shuffle=True, drop_last=drop_last,
                process_index=rank, process_count=world,
            )
        )
    return per_host


def test_hosts_are_disjoint_and_cover_epoch():
    n, world, bs = 64, 4, 4
    per_host = _epoch(n, bs, world)
    seen = [i for batches in per_host.values() for b in batches for i in b]
    assert len(seen) == len(set(seen)) == n  # disjoint + full coverage
    # every host got the same number of batches (required: hosts step in
    # lock-step inside pjit)
    counts = {r: len(b) for r, b in per_host.items()}
    assert len(set(counts.values())) == 1
    for batches in per_host.values():
        assert all(len(b) == bs for b in batches)


def test_uneven_epoch_drops_consistently():
    # 61 samples over 4 hosts: strided slices are 16/15/15/15; with bs=4 and
    # drop_last every host yields 3 full batches — lock-step preserved
    per_host = _epoch(61, 4, 4)
    counts = {r: len(b) for r, b in per_host.items()}
    assert set(counts.values()) == {3}


def test_single_host_default_unchanged():
    per_host = _epoch(16, 4, 1)
    seen = [i for b in per_host[0] for i in b]
    assert sorted(seen) == list(range(16))


def test_same_seed_same_permutation_across_hosts():
    """The host shards are slices of ONE permutation: re-running rank 0 with
    the other ranks' (index, count) reproduces exactly their batches."""
    n, world, bs = 32, 2, 4
    a = _epoch(n, bs, world, seed=3)
    b = _epoch(n, bs, world, seed=3)
    assert a == b
    # different seed -> different permutation
    c = _epoch(n, bs, world, seed=4)
    assert a != c


def test_maybe_initialize_distributed_single_process():
    """Explicit single-process cluster init (the pattern SLURM/MPI users map
    their rank env onto); idempotent on repeat calls. jax.distributed must
    run before any backend init (the CLI calls it first thing in _setup), so
    under the full suite — where earlier tests already initialized XLA —
    this skips."""
    import pytest

    from unitspeech_tpu.parallel.launch import maybe_initialize_distributed

    try:
        assert maybe_initialize_distributed(
            coordinator_address="localhost:12655", num_processes=1, process_id=0
        )
    except RuntimeError as e:
        if "must be called before" in str(e):
            pytest.skip("XLA backend already initialized by earlier tests")
        raise
    # second call: already initialized, still True, no error
    assert maybe_initialize_distributed(
        coordinator_address="localhost:12655", num_processes=1, process_id=0
    )
