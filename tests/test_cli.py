"""CLI + image-format tests (SURVEY.md §4 family 2 style: exercise the
flag surface end-to-end through the real entry points)."""

import os

import numpy as np
import pytest

from grok_tpu.cli import grk_compress, grk_decompress, grk_dump
from grok_tpu.io import formats

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture
def workdir(tmp_path, rng):
    # structured content + mild noise (pure noise is incompressible and
    # makes lossy PSNR thresholds meaningless)
    yy, xx = np.mgrid[0:80, 0:120].astype(float)
    base = 128 + 80 * np.sin(xx / 11) * np.cos(yy / 7)
    arr = np.stack([base, xx * 2, yy * 3], axis=-1)
    arr = (arr + rng.normal(0, 4, arr.shape)).clip(0, 255).astype(np.uint8)
    src = tmp_path / "in.png"
    Image.fromarray(arr).save(src)
    return tmp_path, src, arr


def test_compress_decompress_roundtrip(workdir):
    tmp, src, arr = workdir
    out = tmp / "out.jp2"
    back = tmp / "back.png"
    assert grk_compress.main(["-i", str(src), "-o", str(out), "-n", "4"]) == 0
    assert grk_decompress.main(["-i", str(out), "-o", str(back)]) == 0
    assert np.array_equal(np.asarray(Image.open(back)), arr)


def test_compress_flags(workdir):
    tmp, src, arr = workdir
    out = tmp / "out.j2k"
    rc = grk_compress.main([
        "-i", str(src), "-o", str(out), "-n", "3", "-I",
        "-r", "20,5", "-p", "RPCL", "-c", "[128,128]",
        "-b", "32,32", "-S", "-E", "-M", "1"])
    assert rc == 0
    back = tmp / "back.png"
    assert grk_decompress.main(["-i", str(out), "-o", str(back)]) == 0
    dec = np.asarray(Image.open(back)).astype(float)
    psnr = 10 * np.log10(255 ** 2 / ((dec - arr) ** 2).mean())
    assert psnr > 25, psnr


def test_decompress_reduce_and_window(workdir):
    tmp, src, arr = workdir
    out = tmp / "out.j2k"
    assert grk_compress.main(["-i", str(src), "-o", str(out), "-n", "4"]) == 0
    red = tmp / "red.png"
    assert grk_decompress.main(
        ["-i", str(out), "-o", str(red), "-r", "1"]) == 0
    assert np.asarray(Image.open(red)).shape[:2] == (40, 60)
    win = tmp / "win.png"
    assert grk_decompress.main(
        ["-i", str(out), "-o", str(win), "-d", "10,20,50,60"]) == 0
    got = np.asarray(Image.open(win))
    assert got.shape[:2] == (40, 40)
    assert np.array_equal(got, arr[20:60, 10:50])


def test_dump(workdir, capsys):
    tmp, src, _ = workdir
    out = tmp / "out.jp2"
    assert grk_compress.main(["-i", str(src), "-o", str(out)]) == 0
    assert grk_dump.main(["-i", str(out)]) == 0
    text = capsys.readouterr().out
    assert "progression=LRCP" in text
    assert "comp[2]" in text
    assert "SIZ" in text
    dump_file = tmp / "dump.txt"
    assert grk_dump.main(["-i", str(out), "-o", str(dump_file)]) == 0
    assert dump_file.read_text() == text


def test_batch_mode(workdir):
    tmp, src, arr = workdir
    outdir = tmp / "out"
    outdir.mkdir()
    rc = grk_compress.main(
        ["-y", str(tmp), "-a", str(outdir), "-O", "jp2"])
    assert rc == 0
    assert (outdir / "in.jp2").exists()
    backdir = tmp / "back"
    backdir.mkdir()
    rc = grk_decompress.main(
        ["-y", str(outdir), "-a", str(backdir), "-O", "png"])
    assert rc == 0
    assert np.array_equal(np.asarray(Image.open(backdir / "in.png")), arr)


def test_error_paths(tmp_path):
    missing = str(tmp_path / "nope.png")
    assert grk_compress.main(["-i", missing, "-o", str(tmp_path / "x.jp2")]) == 1
    assert grk_compress.main([]) == 1
    bad = tmp_path / "bad.j2k"
    bad.write_bytes(b"garbage")
    assert grk_decompress.main(
        ["-i", str(bad), "-o", str(tmp_path / "y.png")]) == 1


# ------------------------------------------------------------- formats

def test_pgx_roundtrip(tmp_path, rng):
    from grok_tpu.image import GrkImage

    arr = rng.integers(-2048, 2048, size=(40, 50)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=12, sgnd=True)
    p = str(tmp_path / "t.pgx")
    formats.write_pgx(img, p)
    back = formats.read_pgx(p)
    assert back.comps[0].prec == 12
    assert back.comps[0].sgnd
    assert np.array_equal(back.comps[0].data, arr)


def test_raw_roundtrip(tmp_path, rng):
    from grok_tpu.image import GrkImage

    arr = rng.integers(0, 65536, size=(30, 40, 3)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=16)
    p = str(tmp_path / "t.raw")
    formats.write_raw(img, p)
    back = formats.read_raw(p, "40,30,3,16,u")
    assert np.array_equal(back.to_array(), arr)


def test_raw_descriptor_parse():
    w, h, nc, prec, sgnd, subs = formats.parse_raw_descriptor(
        "640,480,3,8,u@1x1:2x2:2x2")
    assert (w, h, nc, prec, sgnd) == (640, 480, 3, 8, False)
    assert subs == [(1, 1), (2, 2), (2, 2)]
    with pytest.raises(Exception):
        formats.parse_raw_descriptor("garbage")


def test_16bit_png_tiff(tmp_path, rng):
    from grok_tpu.image import GrkImage

    arr = rng.integers(0, 65536, size=(32, 32)).astype(np.uint16)
    p = str(tmp_path / "t.tiff")
    Image.fromarray(arr).save(p)
    img = formats.load_image(p)
    assert img.comps[0].prec == 16
    assert np.array_equal(img.comps[0].data, arr.astype(np.int32))


def test_dump_shows_tile_parts_with_tlm(tmp_path, rng):
    """grk_dump must list every SOT even when the decoder's TLM-seek fast
    path would normally skip the tile-part scan (regression)."""
    import subprocess
    import sys

    from PIL import Image

    arr = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    src = str(tmp_path / "s.png")
    Image.fromarray(arr).save(src)
    j2 = str(tmp_path / "t.j2k")
    subprocess.run([sys.executable, "-m", "grok_tpu.cli.grk_compress",
                    "-i", src, "-o", j2, "-t", "32,32", "-A"], check=True)
    r = subprocess.run([sys.executable, "-m", "grok_tpu.cli.grk_dump",
                        "-i", j2], capture_output=True, text=True)
    assert r.stdout.count("SOT") == 4, r.stdout


def test_random_tile_access(tmp_path, rng):
    """j2k_random_tile_access parity (SURVEY.md §4 family 3): every tile
    decodes independently, in shuffled order, bit-identical to the full
    decode — with tile offsets, subsampling, and a TLM index present."""
    from grok_tpu import codec as gcodec
    from grok_tpu.cli import random_tile_access
    from grok_tpu.image import GrkImage
    from grok_tpu.params import CompressParams

    arr = rng.integers(0, 256, (150, 210, 3)).astype(np.uint8)
    p = CompressParams()
    p.tile_size = (64, 64)
    p.tlm = True
    data = gcodec.compress(GrkImage.from_array(arr), p)
    f = tmp_path / "rta.j2k"
    f.write_bytes(data)
    assert random_tile_access.main(["-i", str(f), "--seed", "11"]) == 0
    assert random_tile_access.main(["-i", str(f), "--seed", "4"]) == 0


def test_strip_streamed_pnm_output(tmp_path, rng):
    """grk_decompress streams PNM output through the async strip writer
    (FileUringIO/StripCache parity) bit-identically to a full decode."""
    from grok_tpu import codec as gcodec
    from grok_tpu.cli import grk_decompress
    from grok_tpu.image import GrkImage
    from grok_tpu.params import CompressParams

    arr = rng.integers(0, 256, (150, 210)).astype(np.uint8)
    p = CompressParams()
    p.tile_size = (64, 64)
    j2 = tmp_path / "s.j2k"
    j2.write_bytes(gcodec.compress(GrkImage.from_array(arr), p))
    out = tmp_path / "s.pgm"
    assert grk_decompress.main(["-i", str(j2), "-o", str(out)]) == 0
    assert np.array_equal(np.asarray(Image.open(out)), arr)

    rgb = rng.integers(0, 65536, (64, 80, 3)).astype(np.uint16)
    j2 = tmp_path / "s16.j2k"
    j2.write_bytes(gcodec.compress(GrkImage.from_array(rgb, prec=16),
                                   CompressParams()))
    out = tmp_path / "s16.ppm"
    assert grk_decompress.main(["-i", str(j2), "-o", str(out)]) == 0
    raw = out.read_bytes()
    hdr = b"P6\n80 64\n65535\n"
    assert raw.startswith(hdr)
    got = np.frombuffer(raw[len(hdr):], dtype=">u2").reshape(64, 80, 3)
    assert np.array_equal(got, rgb)


def test_compare_raw_files(tmp_path):
    from grok_tpu.cli import compare_raw_files

    a = tmp_path / "a.raw"
    b = tmp_path / "b.raw"
    a.write_bytes(b"\x00\x01\x02\x03")
    b.write_bytes(b"\x00\x01\x02\x03")
    assert compare_raw_files.main(["-b", str(a), "-t", str(b)]) == 0
    b.write_bytes(b"\x00\x01\xFF\x03")
    assert compare_raw_files.main(["-b", str(a), "-t", str(b)]) == 1
    b.write_bytes(b"\x00\x01")
    assert compare_raw_files.main(["-b", str(a), "-t", str(b)]) == 1


def test_profile_trace_written(tmp_path, rng):
    """--profile DIR writes a jax.profiler trace (SURVEY.md §5 tracing)."""
    arr = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    src = tmp_path / "p.png"
    Image.fromarray(arr).save(src)
    out = tmp_path / "p.j2k"
    prof = tmp_path / "trace"
    assert grk_compress.main(["-i", str(src), "-o", str(out),
                              "--profile", str(prof)]) == 0
    files = [f for d, _, fs in os.walk(prof) for f in fs]
    assert files, "no trace files written"


def test_subsample_with_offset_keeps_grid_samples(tmp_path):
    """-s dx,dy with -d ox,oy: the surviving samples are those whose
    OFFSET canvas coordinates are multiples of dx/dy (subsampling before
    the offset silently dropped a column of a lossless encode)."""
    import grok_tpu

    arr = (np.arange(20, dtype=np.uint8).reshape(4, 5) * 12)
    Image.fromarray(arr, mode="L").save(tmp_path / "sd.png")
    out = tmp_path / "sd.j2k"
    rc = grk_compress.main(["-i", str(tmp_path / "sd.png"), "-o", str(out),
                            "-s", "2,2", "-d", "1,0", "-n", "2"])
    assert rc == 0
    c = grok_tpu.decompress(out.read_bytes()).comps[0]
    # canvas [1,6)x[0,4): samples at canvas x in {2,4} => input cols 1,3
    assert np.array_equal(c.data, arr[0::2, 1::2])


def test_malformed_numeric_args_clean_error(workdir, capsys):
    """Malformed option values exit 1 with a printed error, never a
    traceback."""
    tmp, src, arr = workdir
    j2 = tmp / "x.j2k"
    assert grk_compress.main(
        ["-i", str(src), "-o", str(j2), "-r", "20,abc"]) == 1
    assert "error:" in capsys.readouterr().err
    grk_compress.main(["-i", str(src), "-o", str(j2)])
    assert grk_decompress.main(
        ["-i", str(j2), "-o", str(tmp / "y.pnm"), "-p", "8,foo"]) == 1
    assert "error:" in capsys.readouterr().err


def test_batch_continues_past_bad_file(workdir):
    """One unreadable file must not abort the batch (reference batch
    mode logs and continues); exit code still reports the failure."""
    tmp, src, arr = workdir
    (tmp / "broken.png").write_bytes(b"not a png")
    outdir = tmp / "bout"
    outdir.mkdir()
    rc = grk_compress.main(["-y", str(tmp), "-a", str(outdir)])
    assert rc == 1  # the bad file is reported...
    assert (outdir / "in.jp2").exists()  # ...but the good one encoded


def test_per_tile_poc(workdir):
    """-P with T<idx>= selectors scopes progression changes to single
    tiles via tile-header POC markers (previously applied globally)."""
    import io

    import grok_tpu

    tmp, src, arr = workdir
    j2 = tmp / "poc.j2k"
    rc = grk_compress.main(
        ["-i", str(src), "-o", str(j2), "-t", "64,64", "-n", "3",
         "-P", "0,0,1,3,3,RLCP/T1=0,0,1,3,3,CPRL"])
    assert rc == 0
    data = j2.read_bytes()
    # tile 1 (and only tile 1) carries its own tile-header POC marker
    from grok_tpu.codestream import markers as mk

    pos, poc_tiles, main_poc = 2, [], 0
    while pos + 4 <= len(data):
        m = int.from_bytes(data[pos:pos + 2], "big")
        if m == mk.SOT:
            tidx = int.from_bytes(data[pos + 4:pos + 6], "big")
            psot = int.from_bytes(data[pos + 6:pos + 10], "big")
            hdr = data[pos:pos + psot]
            if hdr.find(mk.u16(mk.POC), 0, hdr.find(mk.u16(mk.SOD))) >= 0:
                poc_tiles.append(tidx)
            pos += psot
            continue
        if m == mk.POC:
            main_poc += 1
        pos += 2 + int.from_bytes(data[pos + 2:pos + 4], "big")
    # per-tile mode signals POC in EVERY tile header and none in the
    # main header (OpenJPEG appends tile POC entries after main ones,
    # which would shadow the override)
    assert main_poc == 0 and poc_tiles == [0, 1, 2, 3]
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr.astype(np.int32))
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(data))), arr)
