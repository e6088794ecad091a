"""Manifest-driven CLI non-regression runner (SURVEY.md §4 family 2)."""

import os
import shlex

import numpy as np
import pytest

from grok_tpu.cli import (compare_dump_files, compare_images,
                          compare_raw_files, grk_compress, grk_decompress,
                          grk_dump, random_tile_access)
from grok_tpu.io import formats

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

MANIFEST = os.path.join(os.path.dirname(__file__), "data", "test_suite.txt")


def _load_any(path):
    if path.endswith(".pgx"):
        return formats.read_pgx(path).comps[0].data
    return np.asarray(Image.open(path)).astype(np.int64)


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("manifest")
    rng = np.random.default_rng(99)
    yy, xx = np.mgrid[0:64, 0:64].astype(float)
    gray = (128 + 90 * np.sin(xx / 11) * np.cos(yy / 7)
            + rng.normal(0, 4, (64, 64))).clip(0, 255).astype(np.uint8)
    Image.fromarray(gray).save(tmp / "gray8.png")
    rgb = np.stack([gray, (xx * 4).clip(0, 255), (yy * 4).clip(0, 255)],
                   axis=-1).astype(np.uint8)
    Image.fromarray(rgb).save(tmp / "rgb8.png")
    g16 = (gray.astype(np.int32) * 257)
    from grok_tpu.image import GrkImage

    formats.write_pgx(GrkImage.from_array(g16, prec=16),
                      str(tmp / "gray16.pgx"))
    g12 = (gray.astype(np.int32) * 16).clip(0, 4095)
    formats.write_pgx(GrkImage.from_array(g12, prec=12),
                      str(tmp / "gray12.pgx"))
    return tmp


def test_manifest(inputs):
    tmp = inputs
    tools = {"grk_compress": grk_compress.main,
             "grk_decompress": grk_decompress.main,
             "grk_dump": grk_dump.main,
             "compare_images": compare_images.main,
             "compare_dump_files": compare_dump_files.main,
             "compare_raw_files": compare_raw_files.main,
             "random_tile_access": random_tile_access.main}
    with open(MANIFEST) as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            toks = [t.replace("@", str(tmp) + os.sep) if t.startswith("@")
                    else t for t in shlex.split(line)]
            cmd = toks[0]
            if cmd == "expect-oracle":
                # cross-decode OUR stream in the independent OpenJPEG
                # decoder bundled with Pillow and compare bit-exactly
                dec = np.asarray(Image.open(toks[1])).astype(np.int64)
                ref = _load_any(toks[2])
                assert np.array_equal(dec, ref), f"line {lineno}: {line}"
                continue
            if cmd == "expect-size":
                sz = os.path.getsize(toks[1])
                assert sz <= int(toks[2]), \
                    f"line {lineno}: {sz} > {toks[2]} bytes"
                continue
            if cmd == "expect-exact":
                a = _load_any(toks[1])
                b = _load_any(toks[2])
                assert np.array_equal(a, b), f"line {lineno}: {line}"
            elif cmd == "expect-psnr":
                a = _load_any(toks[1]).astype(float)
                b = _load_any(toks[2]).astype(float)
                mse = ((a - b) ** 2).mean()
                psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
                assert psnr >= float(toks[3]), \
                    f"line {lineno}: psnr {psnr:.1f} < {toks[3]}"
            else:
                rc = tools[cmd](toks[1:])
                assert rc == 0, f"line {lineno}: {line} -> rc {rc}"
