"""Quick-suite mesh codec smoke test (VERDICT r4 #7): a dp=2 mesh
round-trip through the public API so mesh-path regressions surface
in-round, not only at the driver's end-of-round dryrun.  The deep
8-device sweep stays in tests/test_mesh_codec.py (excluded from the
quick run for time)."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh2():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    return pmesh.make_mesh(2, dp=2, sp=1)


def test_mesh2_codec_round_trip_bit_exact(rng, mesh2):
    arr = rng.integers(0, 256, (128, 128)).astype(np.int32)
    kw = dict(tile_size=(64, 64), numresolution=2)
    one = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                            CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                             CompressParams(mesh=mesh2, **kw))
    assert one == many
    out = grok_tpu.decompress(many, DecompressParams(mesh=mesh2))
    assert np.array_equal(out.comps[0].data, arr)


def test_mesh_sp_ineligible_skips_batched_entropy(rng, monkeypatch):
    """An sp mesh whose row sharding can't handle the tile height must
    be rejected BEFORE the batched path pays the whole entropy decode
    (the per-tile loop would redo it), and the fallback must return its
    acquired tiles to the geometry pool."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = pmesh.make_mesh(2, dp=1, sp=2)
    # 48-px tiles, numres=3: 48 % (2 << 2) == 0 but (48 >> 2) // 2 = 6
    # < 8 local rows -> sp_transform_ok is False
    assert not pmesh.sp_transform_ok(mesh, 48, 3)
    arr = rng.integers(0, 256, (96, 96)).astype(np.int32)
    data = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                             CompressParams(tile_size=(48, 48),
                                            numresolution=3))
    from grok_tpu.codestream.decompress import CodestreamDecoder

    called = []
    orig = CodestreamDecoder._decode_tiles_device_batched

    def spy(self, *a, **kw):
        called.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(CodestreamDecoder,
                        "_decode_tiles_device_batched", spy)
    out = grok_tpu.decompress(data, DecompressParams(mesh=mesh))
    assert np.array_equal(out.comps[0].data, arr)
    assert not called, "ineligible sp mesh paid the batched entropy decode"


def test_batched_decode_fallback_releases_tiles(rng, mesh2, monkeypatch):
    """When reconstruct_device_batched rejects a prepared batch, the
    acquired tiles must go back to the geometry pool (not leak to GC)."""
    from grok_tpu.codestream import decompress as dmod
    from grok_tpu.tile import processor as pmod

    arr = rng.integers(0, 256, (128, 128)).astype(np.int32)
    data = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                             CompressParams(tile_size=(64, 64),
                                            numresolution=2))
    released = []
    # _decode_tiles_device_batched imports this from tile.processor at
    # call time, so patch it at its source module
    monkeypatch.setattr(pmod, "reconstruct_device_batched",
                        lambda tds, mesh=None: None)
    orig_release = dmod.release_tile
    monkeypatch.setattr(dmod, "release_tile",
                        lambda t: (released.append(t), orig_release(t)))
    out = grok_tpu.decompress(data, DecompressParams(mesh=mesh2))
    assert np.array_equal(out.comps[0].data, arr)
    # 4 tiles released by the rejected batch + 4 by the per-tile loop
    assert len(released) == 8, f"expected 8 releases, got {len(released)}"
