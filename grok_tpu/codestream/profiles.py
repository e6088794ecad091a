"""Cinema / Broadcast / IMF profile parameter enforcement and validation.

Parity: the profile handling of CodeStreamCompress::init + the CLI
(-w/-x/-U/-z, SURVEY.md §2.1 "Codestream compress": "validate profiles
(Cinema/Broadcast/IMF caps)"; §2.2 grk_compress).

Digital-cinema (DCI) constants follow the published DCI spec values used by
the reference family: per-frame codestream caps 1,302,083 bytes (24 fps)
and 651,041 bytes (48 fps); 2K frames <= 2048x1080 at <= 6 resolutions,
4K <= 4096x2160 at <= 7 resolutions with a mandatory resolution-layered
POC; CPRL progression; 32x32 codeblocks; 256x256 precincts (128x128 at the
lowest); SOP/EPH on; single tile.
"""

from __future__ import annotations

import logging

from ..errors import ParamError
from ..params import CompressParams, Profile, Progression, ProgressionChange

log = logging.getLogger("grok_tpu")

CINEMA_24_CS = 1_302_083
CINEMA_48_CS = 651_041
CINEMA_24_COMP = 1_041_666
CINEMA_48_COMP = 520_833


def apply_profile(p: CompressParams, image) -> None:
    """Normalize parameters for the selected profile and validate the
    image against its constraints.  Mutates `p` in place."""
    if p.profile in (Profile.CINEMA_2K, Profile.CINEMA_4K):
        _apply_cinema(p, image)
    elif Profile.BC_SINGLE.value <= int(p.profile) <= Profile.BC_MULTI_R.value:
        _apply_broadcast(p, image)
    elif Profile.IMF_2K.value <= int(p.profile) <= Profile.IMF_8K_R.value:
        _apply_imf(p, image)


def _apply_cinema(p: CompressParams, image) -> None:
    is4k = p.profile == Profile.CINEMA_4K
    w = image.x1 - image.x0
    h = image.y1 - image.y0
    if not is4k and (w > 2048 or h > 1080):
        raise ParamError(
            f"Cinema 2K requires <= 2048x1080, got {w}x{h}")
    if is4k and (w > 4096 or h > 2160):
        raise ParamError(
            f"Cinema 4K requires <= 4096x2160, got {w}x{h}")
    if image.numcomps != 3:
        raise ParamError("Cinema profiles require 3 components (XYZ)")
    for c in image.comps:
        if c.prec != 12:
            log.warning("Cinema profiles expect 12-bit components "
                        "(component has %d)", c.prec)
    p.irreversible = True
    p.prog_order = Progression.CPRL
    p.cblk_width = p.cblk_height = 32
    p.tile_size = None  # single tile
    maxres = 7 if is4k else 6
    if p.numresolution > maxres:
        log.warning("clamping resolutions to %d for cinema profile", maxres)
        p.numresolution = maxres
    if p.numresolution < 2:
        p.numresolution = 2
    # precincts: 256x256, 128x128 at the lowest resolution
    p.precincts = [(256, 256)] * (p.numresolution - 1) + [(128, 128)]
    p.sop = True
    p.eph = True
    p.new_tile_part_progression = "C"
    if is4k:
        # 4K: the 2K sub-resolution must come first (POC with two volumes)
        p.progression_changes = [
            ProgressionChange(0, 0, 1, p.numresolution - 1, 3,
                              Progression.CPRL),
            ProgressionChange(p.numresolution - 1, 0, 1, p.numresolution, 3,
                              Progression.CPRL),
        ]
    cap = CINEMA_48_CS if p.framerate >= 48 else CINEMA_24_CS
    if p.max_cs_size <= 0 or p.max_cs_size > cap:
        p.max_cs_size = cap
    if p.max_comp_size <= 0:
        p.max_comp_size = (CINEMA_48_COMP if p.framerate >= 48
                           else CINEMA_24_COMP)
    if p.layer_rates or p.layer_psnr:
        log.warning("cinema profile overrides explicit rates with the DCI "
                    "codestream cap")
        p.layer_rates = None
        p.layer_psnr = None
    p.numlayers = 1


def _apply_broadcast(p: CompressParams, image) -> None:
    # Broadcast contribution profiles: single tile or 1/4 tiles, irreversible
    # or reversible per variant; rsiz carries the level in bits 0..3.
    p.sop = False
    p.eph = True
    if p.numresolution > 7:
        p.numresolution = 7
    if p.tile_size is not None:
        tw, th = p.tile_size
        w = image.x1 - image.x0
        h = image.y1 - image.y0
        ok = (tw >= w and th >= h) or (2 * tw >= w and 2 * th >= h)
        if not ok:
            raise ParamError("Broadcast profiles allow 1 or 4 equal tiles")


def _apply_imf(p: CompressParams, image) -> None:
    # IMF: single tile, <= 7 resolutions, reversible (R variants) or lossy
    p.tile_size = None
    if p.numresolution > 7:
        p.numresolution = 7
    reversible_profile = int(p.profile) >= Profile.IMF_2K_R.value
    if reversible_profile:
        p.irreversible = False
    w = image.x1 - image.x0
    limits = {Profile.IMF_2K: 2048, Profile.IMF_4K: 4096,
              Profile.IMF_8K: 8192, Profile.IMF_2K_R: 2048,
              Profile.IMF_4K_R: 4096, Profile.IMF_8K_R: 8192}
    lim = limits.get(p.profile)
    if lim and w > lim:
        raise ParamError(f"{p.profile.name} requires width <= {lim}")


def validate_decoded_profile(rsiz: int, hi) -> list[str]:
    """Decoder-side conformance report: list of profile violations found in
    a parsed header (used by grk_dump and tests)."""
    issues = []
    profile = rsiz & 0x3FFF
    if profile in (int(Profile.CINEMA_2K), int(Profile.CINEMA_4K)):
        tcp = hi.cp.tcps[0]
        if tcp.prog_order != Progression.CPRL:
            issues.append("cinema stream must use CPRL progression")
        t = tcp.tccps[0]
        if (1 << t.cblkw) > 32 or (1 << t.cblkh) > 32:
            issues.append("cinema codeblocks must be <= 32x32")
        if t.qmfbid != 0:
            issues.append("cinema streams must use the 9/7 transform")
        if hi.cp.numtiles != 1:
            issues.append("cinema streams must be single-tile")
    return issues
