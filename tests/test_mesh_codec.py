"""Multi-chip codec integration (VERDICT r2 #1): compress()/decompress()
accept a mesh and shard the uniform-tile transform batch over its dp axis
(parallel/mesh.py sharded_analysis/synthesis), with transparent fallback.
Runs on the 8-virtual-device CPU mesh from tests/conftest.py."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8, dp=8, sp=1)


def _img(rng, h, w, ncomp=3):
    return rng.integers(0, 256, (h, w, ncomp)).astype(np.int32)


def test_mesh_encode_bit_identical(rng, mesh8):
    arr = _img(rng, 256, 256)
    kw = dict(tile_size=(64, 64), numresolution=3)
    one = grok_tpu.compress(GrkImage.from_array(arr), CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(mesh=mesh8, **kw))
    assert one == many


def test_mesh_encode_int_spec(rng):
    """mesh=<int> builds a dp mesh over jax.devices()."""
    arr = _img(rng, 128, 128)
    kw = dict(tile_size=(64, 64), numresolution=3)
    one = grok_tpu.compress(GrkImage.from_array(arr), CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(mesh=8, **kw))
    assert one == many


def test_mesh_decode_bit_exact(rng, mesh8):
    arr = _img(rng, 256, 256)
    data = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(tile_size=(64, 64),
                                            numresolution=3))
    out = grok_tpu.decompress(data, DecompressParams(mesh=mesh8))
    assert np.array_equal(out.to_array(), arr)


def test_mesh_batch_not_multiple_of_dp(rng, mesh8):
    """6 full tiles over dp=8: padding must round-trip bit-exactly."""
    arr = _img(rng, 128, 192, 1)[:, :, 0]  # 2x3 = 6 tiles of 64x64
    kw = dict(tile_size=(64, 64), numresolution=3)
    one = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                            CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                             CompressParams(mesh=mesh8, **kw))
    assert one == many
    out = grok_tpu.decompress(many, DecompressParams(mesh=mesh8))
    assert np.array_equal(out.to_array(), arr)


def test_mesh_fallback_nonuniform_tiles(rng, mesh8):
    """Edge tiles (image not a tile multiple) drop to the per-tile host
    path transparently; output stays bit-exact."""
    arr = _img(rng, 200, 168)
    kw = dict(tile_size=(64, 64), numresolution=3)
    one = grok_tpu.compress(GrkImage.from_array(arr), CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(mesh=mesh8, **kw))
    assert one == many
    out = grok_tpu.decompress(many, DecompressParams(mesh=mesh8))
    assert np.array_equal(out.to_array(), arr)


def test_mesh_lossy_round_trip(rng, mesh8):
    """9/7 + ICT through the mesh: decode of the mesh-encoded stream
    matches the single-device decode within one code value (XLA may fuse
    the float synthesis differently per partitioning, flipping an int at
    a rounding boundary by at most 1 ULP)."""
    arr = _img(rng, 256, 256)
    data = grok_tpu.compress(
        GrkImage.from_array(arr),
        CompressParams(tile_size=(64, 64), numresolution=3,
                       irreversible=True, mesh=mesh8))
    out_mesh = grok_tpu.decompress(data, DecompressParams(mesh=mesh8))
    out_one = grok_tpu.decompress(data, DecompressParams(backend="device"))
    diff = np.abs(out_mesh.to_array() - out_one.to_array())
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
    err = np.abs(out_mesh.to_array() - arr)
    assert err.mean() < 3.0


def test_mesh_single_device_spec_is_noop(rng):
    arr = _img(rng, 128, 128)
    one = grok_tpu.compress(GrkImage.from_array(arr),
                            CompressParams(tile_size=(64, 64), mesh=1))
    ref = grok_tpu.compress(GrkImage.from_array(arr),
                            CompressParams(tile_size=(64, 64)))
    assert one == ref


def test_mesh_strip_encode_bit_identical(rng, mesh8):
    """compress_strips honors params.mesh: each tile ROW's uniform tiles
    go through one sharded analysis dispatch, byte-identical to the
    meshless whole-image encode (memory stays O(tile row))."""
    arr = _img(rng, 256, 256)
    img = GrkImage.from_array(arr)
    kw = dict(tile_size=(64, 64), numresolution=3)
    one = grok_tpu.compress(img, CompressParams(**kw))

    meta = GrkImage(x0=img.x0, y0=img.y0, x1=img.x1, y1=img.y1)
    meta.color_space = img.color_space
    for c in img.comps:
        c2 = c.copy()
        c2.data = None
        meta.comps.append(c2)
    planes = [c.data for c in img.comps]

    def reader(y0, h):
        return [pl[y0:y0 + h] for pl in planes]

    many = grok_tpu.compress_strips(meta, reader,
                                    CompressParams(mesh=mesh8, **kw))
    assert one == many


@pytest.fixture(scope="module")
def mesh_dp2sp4():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8, dp=2, sp=4)


def test_sp_single_tile_codec_bit_exact(rng, mesh_dp2sp4):
    """Public-API sp sharding (VERDICT r4 #6): ONE oversized tile's
    transform row-shards over the mesh's sp axis inside compress()/
    decompress(), bit-identical to the single-device stream."""
    arr = _img(rng, 256, 256)
    kw = dict(numresolution=3)
    one = grok_tpu.compress(GrkImage.from_array(arr), CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(mesh=mesh_dp2sp4, **kw))
    assert one == many
    out = grok_tpu.decompress(many, DecompressParams(mesh=mesh_dp2sp4))
    assert np.array_equal(out.to_array(), arr)


def test_sp_dp_combined_tiles_bit_exact(rng, mesh_dp2sp4):
    """dp x sp combined: a 2-tile batch shards tiles over dp AND rows
    over sp in the same shard_map, still bit-identical."""
    arr = _img(rng, 256, 256)
    kw = dict(numresolution=3, tile_size=(256, 128))
    one = grok_tpu.compress(GrkImage.from_array(arr), CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(mesh=mesh_dp2sp4, **kw))
    assert one == many
    out = grok_tpu.decompress(many, DecompressParams(mesh=mesh_dp2sp4))
    assert np.array_equal(out.to_array(), arr)


def test_sp_unsupported_height_falls_back(rng, mesh_dp2sp4):
    """Tile heights that cannot row-shard (not divisible by sp<<levels)
    transparently keep the host path, bit-identical."""
    arr = _img(rng, 250, 256, 1)[:, :, 0]
    kw = dict(numresolution=3)
    one = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                            CompressParams(**kw))
    many = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                             CompressParams(mesh=mesh_dp2sp4, **kw))
    assert one == many


def test_sp_lossy_round_trip(rng, mesh_dp2sp4):
    """Irreversible single-tile sp encode: float association order
    differs across shards (~1e-4 of coefficients move one quantization
    step), so assert decode quality, not byte equality."""
    arr = _img(rng, 256, 256)
    data = grok_tpu.compress(GrkImage.from_array(arr), CompressParams(
        mesh=mesh_dp2sp4, numresolution=3, irreversible=True))
    out = grok_tpu.decompress(data)
    err = np.sqrt(((out.to_array().astype(float) - arr) ** 2).mean())
    assert err < 2.0
