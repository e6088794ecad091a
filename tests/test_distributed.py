"""Multi-host (DCN) batch sharding (VERDICT r2 #9, SURVEY.md §2.3
"Distributed backend" row): deterministic work-list partitioning +
degenerate single-host path, and a simulated 3-host batch run producing
exactly the single-host outputs."""

import os

import numpy as np
import pytest

from grok_tpu.parallel import distributed as dist


def test_shard_batch_partition_properties():
    items = [f"img{i}" for i in range(11)]
    for n in (1, 2, 3, 8, 11, 16):
        shards = [dist.shard_batch(items, n, k) for k in range(n)]
        flat = [x for s in shards for x in s]
        assert sorted(flat) == sorted(items)          # complete
        assert len(flat) == len(set(flat))            # disjoint
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1           # balanced
    with pytest.raises(ValueError):
        dist.shard_batch(items, 2, 2)
    with pytest.raises(ValueError):
        dist.shard_batch(items, 0, 0)


def test_auto_shard_single_process():
    items = list(range(7))
    assert dist.auto_shard(items) == items  # process_count() == 1


def test_init_distributed_degenerate():
    assert dist.init_distributed() == (0, 1)


def test_multi_host_batch_cli_equivalence(tmp_path, rng):
    """Simulate a 3-host batch encode in one process: the union of the
    hosts' outputs equals the single-host run, file for file."""
    from PIL import Image

    from grok_tpu.cli import grk_compress

    src = tmp_path / "in"
    src.mkdir()
    for i in range(7):
        arr = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        Image.fromarray(arr).save(src / f"f{i}.png")

    single = tmp_path / "single"
    single.mkdir()
    assert grk_compress.main(["-y", str(src), "-a", str(single)]) == 0

    multi = tmp_path / "multi"
    multi.mkdir()
    for host in range(3):
        assert grk_compress.main(
            ["-y", str(src), "-a", str(multi),
             "--num-hosts", "3", "--host-id", str(host)]) == 0

    sfiles = sorted(os.listdir(single))
    mfiles = sorted(os.listdir(multi))
    assert sfiles == mfiles and len(sfiles) == 7
    for f in sfiles:
        assert (single / f).read_bytes() == (multi / f).read_bytes(), f
