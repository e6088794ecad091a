"""Runtime-layer tests: tile cache, strip streaming, message handlers,
single-tile decode API (SURVEY.md §2.1 caches; §5 observability)."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.codec import decompress_strips, set_msg_handlers
from grok_tpu.util.caches import TileCache, TileCacheStrategy


def _content(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    arr = 128 + 90 * np.sin(xx / 13) * np.cos(yy / 9)
    return (arr + rng.normal(0, 3, arr.shape)).clip(0, 255).astype(np.int32)


@pytest.fixture
def tiled_stream(rng):
    arr = _content(rng, 96, 128)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, tile_size=(32, 32)))
    return data, arr


def test_tile_cache_hits(tiled_stream):
    data, arr = tiled_stream
    cache = TileCache()
    out1 = grok_tpu.decompress(data, cache=cache)
    assert cache.misses == 12 and cache.hits == 0
    out2 = grok_tpu.decompress(data, cache=cache)
    assert cache.hits == 12
    assert np.array_equal(out1.comps[0].data, arr)
    assert np.array_equal(out2.comps[0].data, arr)


def test_tile_cache_none_strategy(tiled_stream):
    data, arr = tiled_stream
    cache = TileCache(strategy=TileCacheStrategy.NONE)
    grok_tpu.decompress(data, cache=cache)
    grok_tpu.decompress(data, cache=cache)
    assert cache.hits == 0


def test_strip_streaming(tiled_stream):
    data, arr = tiled_stream
    strips = list(decompress_strips(data))
    assert len(strips) == 3  # 96 / 32 tile rows
    full = np.concatenate([s[1][0] for s in strips], axis=0)
    assert np.array_equal(full, arr)


def test_strip_streaming_reduce(tiled_stream):
    data, arr = tiled_stream
    strips = list(decompress_strips(data, DecompressParams(reduce=1)))
    full = np.concatenate([s[1][0] for s in strips], axis=0)
    assert full.shape == (48, 64)


def test_single_tile_decode(tiled_stream):
    data, arr = tiled_stream
    out = grok_tpu.decompress(data, DecompressParams(tile_index=5))
    # tile 5 = grid (1,1): rows 32:64, cols 32:64 (grid is 4 wide)
    full = grok_tpu.decompress(data)
    t = out.comps[0].data[32:64, 32:64]
    assert np.array_equal(t, full.comps[0].data[32:64, 32:64])


def test_msg_handlers(tiled_stream):
    data, _ = tiled_stream
    msgs = {"warn": [], "error": [], "info": []}
    set_msg_handlers(info=msgs["info"].append, warn=msgs["warn"].append,
                     error=msgs["error"].append)
    try:
        grok_tpu.decompress(data[: len(data) // 2])  # truncated -> warnings
        assert msgs["warn"], "expected warnings for truncated stream"
    finally:
        import logging

        logging.getLogger("grok_tpu").handlers.clear()


def test_mmap_file_api(tmp_path, rng):
    """MemStream parity: decode straight from a memory-mapped file."""
    from grok_tpu.codec import compress_file, decompress_file

    arr = _content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    p = str(tmp_path / "t.jp2")
    n = compress_file(img, p, CompressParams(
        numresolution=3, cod_format="jp2", tile_size=(48, 48)))
    assert n > 0
    out = decompress_file(p)
    assert np.array_equal(out.comps[0].data, arr)
    t = decompress_file(p, DecompressParams(tile_index=2))
    assert t.comps[0].data.shape == arr.shape


def test_exif_transfer(tmp_path, rng):
    """-V: EXIF rides a "JpgTiffExif->JP2" uuid box through the JP2 and
    back onto the decoded output file (reference CLI "EXIF transfer")."""
    import subprocess
    import sys

    from PIL import Image

    arr = _content(rng, 32, 32).astype(np.uint8)
    im = Image.fromarray(arr)
    exif = Image.Exif()
    exif[271] = "grok_tpu test make"   # tag 271 = Make
    src = str(tmp_path / "s.jpg")
    im.save(src, exif=exif, quality=95)

    j2 = str(tmp_path / "s.jp2")
    out = str(tmp_path / "o.png")
    env = None
    r = subprocess.run([sys.executable, "-m", "grok_tpu.cli.grk_compress",
                        "-i", src, "-o", j2, "-V"], capture_output=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "grok_tpu.cli.grk_decompress",
                        "-i", j2, "-o", out], capture_output=True)
    assert r.returncode == 0, r.stderr
    got = Image.open(out).getexif()
    assert got[271] == "grok_tpu test make"

    # without -V the box must not be written
    r = subprocess.run([sys.executable, "-m", "grok_tpu.cli.grk_compress",
                        "-i", src, "-o", j2], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert b"JpgTiffExif->JP2" not in open(j2, "rb").read()


def test_fine_strip_streaming(rng):
    """strip_height strips through the window-aware path: assembled
    output equals the full decode, and each strip is O(strip) tall even
    inside a single large tile."""
    yy, xx = np.mgrid[0:256, 0:192].astype(float)
    arr = ((np.sin(xx / 17) * np.cos(yy / 23) + 1) * 110).astype(np.uint8)
    data = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(numresolution=4))
    full = grok_tpu.decompress(data)
    rows = []
    for y0, strips in decompress_strips(data, strip_height=48):
        s = strips[0]
        assert s.shape[0] <= 48
        rows.append((y0, s))
    assembled = np.concatenate([s for _, s in rows], axis=0)
    assert np.array_equal(assembled, full.comps[0].data)
    assert rows[0][0] == 0 and len(rows) == 6


def test_plt_guided_packet_skip(rng):
    """With a PLT index present, window decode skips parsing packets of
    precincts outside the region (SURVEY.md §3.3 O(region) path) and still
    reproduces the full decode bit-exactly."""
    import grok_tpu
    from grok_tpu import CompressParams, DecompressParams, GrkImage
    from grok_tpu.codestream.decompress import CodestreamDecoder

    g = rng.integers(0, 256, size=(512, 512)).astype(np.int32)
    p = CompressParams(numresolution=5, tile_size=(256, 256),
                       precincts=[(128, 128)], plt=True)
    data = grok_tpu.compress(GrkImage.from_array(g, prec=8), p)

    dec = CodestreamDecoder(data)
    dec.parse()
    dp = DecompressParams()
    dp.window = (10, 10, 100, 100)
    out = dec.decode(dp)
    assert np.array_equal(out.comps[0].data, g[10:100, 10:100])
    # at least the three other tiles' precincts were skipped unparsed
    assert getattr(dec, "_last_skipped", None) is None  # decoder-level n/a

    # count skips on a single-tile windowed decode via the processor hook
    import grok_tpu.tile.processor as proc
    skipped = []
    orig = proc.TileDecompressor.decode_packets

    def wrapper(self, *a, **kw):
        r = orig(self, *a, **kw)
        skipped.append(getattr(self, "_skipped_packets", 0))
        return r

    proc.TileDecompressor.decode_packets = wrapper
    try:
        dec2 = CodestreamDecoder(data)
        dec2.parse()
        out2 = dec2.decode(dp)
    finally:
        proc.TileDecompressor.decode_packets = orig
    assert np.array_equal(out2.comps[0].data, g[10:100, 10:100])
    assert sum(skipped) > 0, "no packets were PLT-skipped"


def test_stream_object_api(rng):
    """compress_stream/decompress_stream (grk_stream_params callback-stream
    parity) round-trip through file-like objects."""
    import io as _io

    import grok_tpu
    from grok_tpu import CompressParams, GrkImage

    arr = rng.integers(0, 256, (40, 60)).astype(np.int32)
    buf = _io.BytesIO()
    n = grok_tpu.compress_stream(GrkImage.from_array(arr, prec=8), buf,
                                 CompressParams(numresolution=3))
    assert n == buf.tell() and n > 0
    buf.seek(0)
    out = grok_tpu.decompress_stream(buf)
    assert np.array_equal(out.comps[0].data, arr)
    # error types are reachable from the package root
    assert issubclass(grok_tpu.CodestreamError, grok_tpu.GrkError)
