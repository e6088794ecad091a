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


def test_two_process_jax_distributed_batch(tmp_path, rng):
    """A REAL two-process jax.distributed job (VERDICT r3 #8): each
    process initializes against a localhost coordinator, auto_shard
    takes its slice of a directory batch, and the union of the two
    hosts' encodes is disjoint, complete, and byte-identical to a
    single-process run."""
    import socket
    import subprocess
    import sys

    from PIL import Image

    import grok_tpu
    from grok_tpu import CompressParams, GrkImage

    src = tmp_path / "in"
    src.mkdir()
    ref = {}
    for i in range(5):
        arr = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        Image.fromarray(arr).save(src / f"f{i}.png")
        ref[f"f{i}.png"] = grok_tpu.compress(
            GrkImage.from_array(arr.astype(np.int32)),
            CompressParams(numresolution=3))

    worker = tmp_path / "worker.py"
    worker.write_text(
        "import os, sys\n"
        "src, dst, port, pid = sys.argv[1:5]\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from grok_tpu.parallel import distributed as dist\n"
        "idx, cnt = dist.init_distributed('127.0.0.1:' + port, 2, "
        "int(pid))\n"
        "assert (idx, cnt) == (int(pid), 2), (idx, cnt)\n"
        "import numpy as np\n"
        "from PIL import Image\n"
        "import grok_tpu\n"
        "from grok_tpu import CompressParams, GrkImage\n"
        "mine = dist.auto_shard(sorted(os.listdir(src)))\n"
        "for f in mine:\n"
        "    arr = np.asarray(Image.open(os.path.join(src, f)))\n"
        "    data = grok_tpu.compress(\n"
        "        GrkImage.from_array(arr.astype(np.int32)),\n"
        "        CompressParams(numresolution=3))\n"
        "    open(os.path.join(dst, f + '.j2k'), 'wb').write(data)\n"
        "print('SHARD', idx, ' '.join(mine))\n")

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    dsts = []
    procs = []
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # APPEND to PYTHONPATH (CLAUDE.md: the axon sitecustomize must stay
    # importable from the original path)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    for k in range(2):
        d = tmp_path / f"out{k}"
        d.mkdir()
        dsts.append(d)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(src), str(d), str(port),
             str(k)], stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))
    shards = []
    for k, p in enumerate(procs):
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker {k}: {err[-800:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("SHARD")][0]
        shards.append(line.split()[2:])
    # disjoint + complete partition
    union = sorted(shards[0] + shards[1])
    assert union == sorted(ref) and len(shards[0]) + len(shards[1]) == 5
    assert not set(shards[0]) & set(shards[1])
    # byte-identical to the single-process encodes
    for k, d in enumerate(dsts):
        for f in shards[k]:
            assert (d / (f + ".j2k")).read_bytes() == ref[f], f
