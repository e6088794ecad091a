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
    # streaming-encoder-produced file (VERDICT r4 #8): the strip encoder
    # emits tile-parts incrementally with a seek-back-patched TLM — its
    # marker layout (reserved-span TLM + COM filler) is a distinct
    # decode surface from the whole-image writer's
    import tempfile

    meta = GrkImage(x0=0, y0=0, x1=96, y1=80)
    from grok_tpu.image import ImageComponent

    c = ImageComponent(prec=8, sgnd=False)
    c.w, c.h = 96, 80
    meta.comps.append(c)
    plane = rng.integers(0, 256, (80, 96)).astype(np.int32)
    with tempfile.NamedTemporaryFile(suffix=".j2k", delete=False) as tf:
        grok_tpu.compress_strips_file(
            meta, lambda y0, h: [plane[y0:y0 + h]], tf.name,
            CompressParams(numresolution=3, tile_size=(48, 48), tlm=True,
                           sop=True, eph=True, precincts=[(32, 32)]))
        seeds.append(open(tf.name, "rb").read())
    os.unlink(tf.name)
    # oracle-produced stream (independent encoder's marker layout)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr3.astype(np.uint8)).save(buf, "JPEG2000",
                                                irreversible=False)
    seeds.append(buf.getvalue())
    return seeds


def _mutate(rng, data: bytes) -> bytes:
    ba = bytearray(data)
    kind = rng.integers(0, 5)
    if kind == 4:  # SOP-targeted family (VERDICT r4 #2): exercise the
        # mid-tile Nsop resync — smash a marker, its Nsop, the header
        # behind it, or splice a whole inter-SOP span out
        sops = []
        o = data.find(b"\xff\x91")
        while o >= 0 and len(sops) < 256:
            sops.append(o)
            o = data.find(b"\xff\x91", o + 2)
        if not sops:
            kind = 0  # seed has no SOP markers: plain byte flips
        else:
            i = int(rng.integers(0, len(sops)))
            mode = int(rng.integers(0, 4))
            if mode == 0:  # destroy the marker segment
                ba[sops[i]:sops[i] + 6] = bytes(6)
            elif mode == 1:  # corrupt Nsop (desynchronize the counter)
                ba[sops[i] + 4:sops[i] + 6] = bytes(
                    int(rng.integers(0, 0x10000)).to_bytes(2, "big"))
            elif mode == 2:  # smash the packet header after the marker
                end = min(sops[i] + 6 + int(rng.integers(1, 16)), len(ba))
                for j in range(sops[i] + 6, end):
                    ba[j] = int(rng.integers(0, 256))
            elif i + 1 < len(sops):  # splice the whole packet out
                del ba[sops[i]:sops[i + 1]]
            else:
                ba = ba[:sops[i]]
            return bytes(ba)
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


def test_pnm_strip_reader_fuzz(tmp_path):
    """The streaming-encode input path (open_pnm_strips +
    compress_strips, VERDICT r4 #8): truncated headers, short bodies and
    mutated magic/dimension tokens must surface as GrkError — never a
    deep traceback or a hang."""
    rng = np.random.default_rng(FUZZ_SEED ^ 0x5A5A)
    from grok_tpu.io import formats

    base = bytearray(b"P5\n64 48\n255\n")
    base += bytes(rng.integers(0, 256, 64 * 48, dtype=np.uint8))
    failures = []
    for i in range(120):
        ba = bytearray(base)
        mode = i % 4
        if mode == 0:  # truncate (header or body)
            ba = ba[:int(rng.integers(1, len(ba)))]
        elif mode == 1:  # mutate header tokens
            for _ in range(int(rng.integers(1, 4))):
                j = int(rng.integers(0, 13))
                ba[j] = int(rng.integers(0, 256))
        elif mode == 2:  # short body
            ba = ba[:13 + int(rng.integers(0, 64 * 48))]
        else:  # giant declared dims vs small body
            ba[3:8] = b"99999"
        p = tmp_path / f"f{i}.pgm"
        p.write_bytes(bytes(ba))
        try:
            meta, reader = formats.open_pnm_strips(str(p))
            try:
                grok_tpu.compress_strips(
                    meta, reader, CompressParams(numresolution=3,
                                                 tile_size=(32, 32)))
            finally:
                reader.close()
        except ALLOWED:
            pass
        except (ValueError, OverflowError) as e:
            # dimension tokens are ints parsed from untrusted text; a
            # non-numeric token raising ValueError at the API boundary
            # is acceptable discipline only if it names the file format
            if "PNM" not in str(e) and "invalid literal" not in str(e):
                failures.append((i, type(e).__name__, str(e)[:120]))
        except Exception as e:  # noqa: BLE001
            failures.append((i, type(e).__name__, str(e)[:120]))
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
