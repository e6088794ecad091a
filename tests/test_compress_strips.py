"""Streaming encode (compress_strips, SURVEY.md §5 long-context
mechanisms): the strip-reader driver must produce byte-identical
codestreams to the whole-image compress() across tiling, rate control,
HT, index markers, subsampling and canvas offsets, while holding only
one tile row of samples at a time."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, GrkImage
from grok_tpu.errors import ParamError
from grok_tpu.image import ImageComponent


def _content(rng, h, w, ncomp=3):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    base = 128 + 90 * np.sin(xx / 19) * np.cos(yy / 13)
    return (base[..., None] + rng.normal(0, 8, (h, w, ncomp))).clip(
        0, 255).astype(np.uint8)


def _meta_of(img: GrkImage) -> GrkImage:
    m = GrkImage(x0=img.x0, y0=img.y0, x1=img.x1, y1=img.y1)
    m.color_space = img.color_space
    for c in img.comps:
        c2 = c.copy()
        c2.data = None
        m.comps.append(c2)
    return m


def _reader_of(img: GrkImage):
    planes = [c.data for c in img.comps]

    calls = []

    def reader(y0, h):
        calls.append((y0, h))
        out = []
        for c, pl in zip(img.comps, planes):
            r0 = -(-y0 // c.dy) - c.y0
            r1 = -(-(y0 + h) // c.dy) - c.y0
            out.append(pl[r0:r1])
        return out

    reader.calls = calls
    return reader


@pytest.mark.parametrize("kw", [
    dict(tile_size=(128, 128)),
    dict(tile_size=(256, 200), irreversible=True),
    dict(tile_size=(128, 256), layer_rates=[40, 10]),
    dict(tile_size=(200, 130), ht=True, plt=True, tlm=True),
    dict(tile_size=(256, 256), max_cs_size=30000, plt=True),
    dict(tile_size=(130, 140), layer_psnr=[37.0]),
    dict(),  # single tile
])
def test_strips_byte_identical(rng, kw):
    arr = _content(rng, 520, 390)
    img = GrkImage.from_array(arr)
    whole = grok_tpu.compress(GrkImage.from_array(arr),
                              CompressParams(**kw))
    reader = _reader_of(img)
    strips = grok_tpu.compress_strips(_meta_of(img), reader,
                                      CompressParams(**kw))
    assert whole == strips
    # one reader call per tile row, each spanning exactly that row
    grid_h = -(-520 // kw.get("tile_size", (520, 520))[1])
    assert len(reader.calls) == grid_h


def test_strips_subsampled_offset_image(rng):
    w, h = 260, 212
    img = GrkImage(x0=3, y0=5, x1=3 + w, y1=5 + h)
    for dx, dy in [(1, 1), (2, 2), (2, 2)]:
        cw = -(-(3 + w) // dx) - (-(-3 // dx))
        ch = -(-(5 + h) // dy) - (-(-5 // dy))
        c = ImageComponent(dx=dx, dy=dy, prec=8, sgnd=False)
        c.data = rng.integers(0, 256, (ch, cw)).astype(np.int32)
        c.h, c.w = ch, cw
        c.x0 = -(-3 // dx)
        c.y0 = -(-5 // dy)
        img.comps.append(c)
    for kw in [dict(tile_size=(96, 80), tile_offset=(2, 4)),
               dict(tile_size=(100, 100), mct=0, irreversible=True)]:
        whole = grok_tpu.compress(img, CompressParams(**kw))
        strips = grok_tpu.compress_strips(_meta_of(img), _reader_of(img),
                                          CompressParams(**kw))
        assert whole == strips, kw


def test_strips_decodes_and_validates(rng):
    arr = _content(rng, 300, 280)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress_strips(_meta_of(img), _reader_of(img),
                                    CompressParams(tile_size=(128, 128)))
    back = np.stack([c.data for c in grok_tpu.decompress(data).comps], -1)
    assert np.array_equal(back, arr.astype(np.int32))
    # a reader returning the wrong shape is rejected up front
    with pytest.raises(ParamError):
        grok_tpu.compress_strips(
            _meta_of(img), lambda y0, h: [np.zeros((1, 1), np.int32)] * 3,
            CompressParams(tile_size=(128, 128)))
    # whole-image compress without data stays a clear error
    with pytest.raises(ParamError):
        grok_tpu.compress(_meta_of(img), CompressParams())


def test_cli_stream_strips(rng, tmp_path):
    """grk_compress --stream-strips: byte-identical to the whole-image
    CLI route for P6/P5 inputs (incl. 16-bit big-endian)."""
    from PIL import Image

    from grok_tpu.cli import grk_compress

    arr = _content(rng, 260, 220)
    src = tmp_path / "in.ppm"
    Image.fromarray(arr).save(src)
    a = tmp_path / "a.jp2"
    b = tmp_path / "b.jp2"
    assert grk_compress.main(["-i", str(src), "-o", str(a),
                              "-t", "128,128", "--stream-strips"]) == 0
    assert grk_compress.main(["-i", str(src), "-o", str(b),
                              "-t", "128,128"]) == 0
    # the streamed container uses an LBox=0 jp2c (length-to-EOF); the
    # embedded codestreams must be byte-identical
    from grok_tpu.codestream import jp2 as jp2_mod

    cs_a, _, _ = jp2_mod.unwrap_jp2(a.read_bytes())
    cs_b, _, _ = jp2_mod.unwrap_jp2(b.read_bytes())
    assert bytes(cs_a) == bytes(cs_b)

    g16 = rng.integers(0, 65536, (150, 130)).astype(np.uint16)
    src16 = tmp_path / "in16.pgm"
    src16.write_bytes(b"P5\n130 150\n65535\n" + g16.astype(">u2").tobytes())
    out16 = tmp_path / "o16.j2k"
    assert grk_compress.main(["-i", str(src16), "-o", str(out16),
                              "-t", "96,96", "--stream-strips"]) == 0
    back = grok_tpu.decompress(out16.read_bytes()).comps[0].data
    assert np.array_equal(back, g16.astype(np.int32))


def test_strips_file_sink_tlm_seekback(rng, tmp_path):
    """compress_strips_file streams tile-parts to disk and patches TLM
    by seek-back (COM filler absorbs the reservation slack); decodes
    must match the in-memory compress_strips stream, the TLM must stay
    usable for tile access, and OpenJPEG must accept the LBox=0 jp2."""
    arr = _content(rng, 330, 270)
    img = GrkImage.from_array(arr)

    for kw in [dict(tile_size=(128, 128), tlm=True, plt=True),
               dict(tile_size=(96, 96), tlm=True,
                    new_tile_part_progression="R"),
               dict(tile_size=(128, 160))]:
        inmem = grok_tpu.compress_strips(_meta_of(img), _reader_of(img),
                                         CompressParams(**kw))
        path = tmp_path / "s.j2k"
        n = grok_tpu.compress_strips_file(
            _meta_of(img), _reader_of(img), str(path),
            CompressParams(**kw))
        ondisk = path.read_bytes()
        assert n == len(ondisk)
        a = grok_tpu.decompress(inmem)
        b = grok_tpu.decompress(ondisk)
        assert all(np.array_equal(x.data, y.data)
                   for x, y in zip(a.comps, b.comps)), kw
        if kw.get("tlm"):
            # TLM-guided single-tile decode through the patched index
            from grok_tpu import DecompressParams

            dp = DecompressParams()
            dp.tile_index = 3
            t = grok_tpu.decompress(ondisk, dp)
            assert t.comps[0].data.size > 0

    from PIL import Image

    p = CompressParams(tile_size=(128, 128), tlm=True)
    p.cod_format = "jp2"
    jp = tmp_path / "s.jp2"
    grok_tpu.compress_strips_file(_meta_of(img), _reader_of(img),
                                  str(jp), p)
    assert np.array_equal(np.asarray(Image.open(jp)), arr)
    with pytest.raises(ParamError):
        grok_tpu.compress_strips_file(
            _meta_of(img), _reader_of(img), str(tmp_path / "x.j2k"),
            CompressParams(tile_size=(128, 128), ppm=True))


def test_tlm_sink_position_outer_progression(rng, tmp_path):
    """-u R under CPRL (the IMF default combination) produces up to
    comps x positions x resolutions tile-parts per tile: the sink's TLM
    reservation must cover them (a layers*res*comps bound undershot and
    silently dropped the mandatory index)."""
    from grok_tpu.codestream import markers as mk
    from grok_tpu.params import Progression

    arr = _content(rng, 256, 256)
    img = GrkImage.from_array(arr)

    def _params():
        p = CompressParams(tile_size=(64, 64), tlm=True, plt=True,
                           new_tile_part_progression="R")
        p.prog_order = Progression.CPRL
        p.precincts = [(16, 16)]  # 36 tile-parts/tile (> L*R*C = 18)
        return p

    path = tmp_path / "cprl.j2k"
    grok_tpu.compress_strips_file(_meta_of(img), _reader_of(img),
                                  str(path), _params())
    ondisk = path.read_bytes()
    # the TLM index must be present and name every tile-part
    pos, entries = 2, []
    while pos + 4 <= len(ondisk):
        m, ln = int.from_bytes(ondisk[pos:pos + 2], "big"), \
            int.from_bytes(ondisk[pos + 2:pos + 4], "big")
        if m == mk.TLM:
            entries += mk.read_tlm(ondisk[pos + 4:pos + 2 + ln])[1]
        if m == mk.SOT:
            break
        pos += 2 + ln
    assert entries, "TLM index was dropped"
    # walk the tile-parts through the TLM lengths: the index must name
    # every SOT back-to-back up to EOC
    assert len(entries) > 16 * 18
    for _, ln in entries:
        assert ondisk[pos:pos + 2] == mk.u16(mk.SOT)
        pos += ln
    assert ondisk[pos:pos + 2] == mk.u16(mk.EOC)
    inmem = grok_tpu.compress_strips(_meta_of(img), _reader_of(img),
                                     _params())
    a = grok_tpu.decompress(inmem)
    b = grok_tpu.decompress(ondisk)
    assert all(np.array_equal(x.data, y.data)
               for x, y in zip(a.comps, b.comps))


def test_com_filler_spans_marker_limit():
    """The TLM reservation gap can exceed one COM segment's 64KB limit;
    the filler must split while keeping the exact byte count."""
    from grok_tpu.codestream import markers as mk
    from grok_tpu.codestream.compress import _com_filler

    for n in (0, 6, 100, 65537, 65538, 65543, 200000):
        blob = _com_filler(n)
        assert len(blob) == n
        pos = 0
        while pos < n:
            assert blob[pos:pos + 2] == mk.u16(mk.COM)
            ln = int.from_bytes(blob[pos + 2:pos + 4], "big")
            pos += 2 + ln
        assert pos == n
