"""Time-budgeted decoder mutation fuzz (VERDICT r2 #6; ref analog:
tests/fuzzers/ [P]).

Seed corpus: self- and oracle-produced streams covering tiles, layers,
HT, indexes (TLM/PLT/PLM), packed headers and the JP2 container.  Each
trial applies random byte flips, truncations or splices and asserts the
decoder's error discipline:

- non-strict decode either returns an image or raises a GrkError — never
  an unhandled TypeError/IndexError/... from deep inside, never a hang
  (each trial is wall-clock bounded);
- strict decode may additionally raise GrkError (it must not be more
  permissive in failure type).

The RNG seed is fixed by default (reproducible corpus) and rotated per
round by the sanitizer harness via GROK_TPU_FUZZ_SEED (native/sanitize.sh
derives it from the commit count).  GROK_TPU_FUZZ_TRIALS raises the
minimum trial count for deep runs (VERDICT r3 #9: >= 5000 mutations
under ASan); the default keeps the quick suite fast.
"""

import io
import os
import time

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.errors import GrkError
from grok_tpu.params import Progression, ProgressionChange

ALLOWED = (GrkError,)
MIN_TRIALS = int(os.environ.get("GROK_TPU_FUZZ_TRIALS", "500"))
MAX_TRIALS = MIN_TRIALS * 3
BUDGET_SECONDS = float(os.environ.get("GROK_TPU_FUZZ_BUDGET", "45"))
FUZZ_SEED = int(os.environ.get("GROK_TPU_FUZZ_SEED", "61474"))


def _subsampled(rng, w, h):
    from grok_tpu.image import ImageComponent

    img = GrkImage(x0=0, y0=0, x1=w, y1=h)
    for dx, dy in ((1, 1), (2, 2), (2, 2)):
        c = ImageComponent(dx=dx, dy=dy, prec=12, sgnd=False)
        cw, ch = -(-w // dx), -(-h // dy)
        c.data = rng.integers(0, 4096, size=(ch, cw)).astype(np.int32)
        c.w, c.h = cw, ch
        img.comps.append(c)
    return img


def _seed_corpus():
    rng = np.random.default_rng(77)
    arr1 = rng.integers(0, 256, (96, 96)).astype(np.int32)
    arr3 = rng.integers(0, 256, (80, 112, 3)).astype(np.int32)
    seeds = [
        grok_tpu.compress(GrkImage.from_array(arr1, prec=8),
                          CompressParams(numresolution=3)),
        grok_tpu.compress(GrkImage.from_array(arr3),
                          CompressParams(numresolution=3,
                                         tile_size=(48, 48), tlm=True,
                                         plt=True, sop=True, eph=True)),
        grok_tpu.compress(GrkImage.from_array(arr3),
                          CompressParams(numresolution=4, ht=True,
                                         cod_format="jp2")),
        grok_tpu.compress(GrkImage.from_array(arr3),
                          CompressParams(numresolution=3,
                                         irreversible=True,
                                         layer_rates=[20, 5], ppm=True)),
        grok_tpu.compress(GrkImage.from_array(arr1, prec=8),
                          CompressParams(numresolution=3, plm=True,
                                         precincts=[(32, 32)],
                                         new_tile_part_progression="R")),
        # MIXED set: per-block MQ/HT dispatch + CAP Part-15 bits
        grok_tpu.compress(GrkImage.from_array(arr3),
                          CompressParams(numresolution=3, ht=True,
                                         ht_mixed=True,
                                         tile_size=(64, 64))),
        # POC with two progression volumes + PPT packed headers
        grok_tpu.compress(GrkImage.from_array(arr3),
                          CompressParams(
                              numresolution=4, ppt=True,
                              progression_changes=[
                                  ProgressionChange(0, 0, 1, 2, 3,
                                                    Progression.RLCP),
                                  ProgressionChange(2, 0, 1, 4, 3,
                                                    Progression.CPRL)])),
        # subsampled chroma (4:2:0-style SIZ) + 12-bit precision
        grok_tpu.compress(_subsampled(rng, 64, 48),
                          CompressParams(numresolution=3)),
    ]
    # oracle-produced stream (independent encoder's marker layout)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr3.astype(np.uint8)).save(buf, "JPEG2000",
                                                irreversible=False)
    seeds.append(buf.getvalue())
    return seeds


def _mutate(rng, data: bytes) -> bytes:
    ba = bytearray(data)
    kind = rng.integers(0, 4)
    if kind == 0:  # byte flips (1-8 random positions)
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(0, len(ba)))
            ba[i] ^= int(rng.integers(1, 256))
    elif kind == 1:  # truncation
        ba = ba[:int(rng.integers(2, len(ba)))]
    elif kind == 2:  # splice: copy a random chunk over another position
        n = int(rng.integers(1, min(64, len(ba))))
        src = int(rng.integers(0, len(ba) - n + 1))
        dst = int(rng.integers(0, len(ba) - n + 1))
        ba[dst:dst + n] = ba[src:src + n]
    else:  # targeted marker-area corruption (first 256 bytes)
        lim = min(256, len(ba))
        for _ in range(int(rng.integers(1, 5))):
            i = int(rng.integers(0, lim))
            ba[i] ^= int(rng.integers(1, 256))
    return bytes(ba)


def test_decoder_mutation_fuzz():
    seeds = _seed_corpus()
    rng = np.random.default_rng(FUZZ_SEED)
    t0 = time.perf_counter()
    trials = 0
    failures = []
    while trials < MAX_TRIALS:
        if trials >= MIN_TRIALS and time.perf_counter() - t0 > BUDGET_SECONDS:
            break
        data = _mutate(rng, seeds[trials % len(seeds)])
        strict = trials % 3 == 0
        # a 30 KB mutant can legally declare a huge canvas; the pixel
        # budget keeps each trial bounded (and is itself part of the
        # surface under test)
        dp = DecompressParams(strict=strict, max_pixels=1 << 22)
        if trials % 5 == 4:
            # window/reduce decode paths see the same mutations (the
            # TLM/PLT-guided skipping and produce-chain cropping have
            # their own failure modes on corrupt indexes)
            dp.window = (
                int(rng.integers(0, 32)), int(rng.integers(0, 32)),
                int(rng.integers(33, 96)), int(rng.integers(33, 96)))
            dp.reduce = int(rng.integers(0, 3))
        t_trial = time.perf_counter()
        try:
            grok_tpu.decompress(data, dp)
        except ALLOWED:
            pass
        except Exception as e:  # noqa: BLE001 - the point of the fuzz
            failures.append((trials, strict, type(e).__name__, str(e)[:120]))
        # hang guard: a single small-stream decode taking >10 s means a
        # mutation found a pathological loop
        assert time.perf_counter() - t_trial < 10.0, \
            f"trial {trials} exceeded the per-decode time bound"
        trials += 1
    assert trials >= MIN_TRIALS, (
        f"only {trials} mutations ran inside the budget — corpus decode "
        f"too slow")
    assert not failures, failures[:10]


def test_decoder_fuzz_header_api():
    """read_header must obey the same discipline on mutated prefixes."""
    seeds = _seed_corpus()
    rng = np.random.default_rng(0xF023)
    failures = []
    for i in range(200):
        data = _mutate(rng, seeds[i % len(seeds)])
        try:
            grok_tpu.read_header(data)
        except ALLOWED:
            pass
        except Exception as e:  # noqa: BLE001
            failures.append((i, type(e).__name__, str(e)[:120]))
    assert not failures, failures[:10]
