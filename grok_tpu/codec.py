"""High-level codec API.

Parity: the grk_* public C API surface (SURVEY.md §2.1 "Public API",
src/lib/core/grok.h [P]):

- grk_compress_init + grk_compress      -> compress(image, params)
- grk_decompress_init + read_header     -> read_header(data)
- grk_decompress_set_window + decompress-> decompress(data, params)
- grk_decompress_tile                   -> decompress(data, params with
                                           tile_index)
"""

from __future__ import annotations

import logging

import numpy as np

from .codestream import jp2 as jp2_mod
from .codestream.compress import compress_codestream
from .codestream.decompress import CodestreamDecoder, HeaderInfo
from .image import ColorSpace, GrkImage
from .params import CompressParams, DecompressParams

log = logging.getLogger("grok_tpu")


def compress(image: GrkImage, params: CompressParams | None = None) -> bytes:
    """Encode a GrkImage to a raw codestream (.j2k) or JP2 file."""
    params = params or CompressParams()
    cs = compress_codestream(image, params)
    if params.cod_format == "jp2":
        return jp2_mod.wrap_jp2(cs, image)
    return cs


def read_header(data: bytes, strict: bool = False) -> HeaderInfo:
    """Parse the container + codestream headers without decoding tiles
    (grk_decompress_read_header parity; basis of grk_dump)."""
    if jp2_mod.is_jp2(data):
        cs, meta, colorspace = jp2_mod.unwrap_jp2(data)
    else:
        cs, meta, colorspace = data, None, None
    dec = CodestreamDecoder(cs, strict=strict)
    hi = dec.parse()
    if meta is not None:
        hi.image.meta = meta
    if colorspace is not None:
        hi.image.color_space = colorspace
    hi._decoder = dec  # cached for a subsequent decompress() call
    return hi


def decompress(data: bytes, params: DecompressParams | None = None) -> GrkImage:
    """Decode a raw codestream or JP2 file to a GrkImage."""
    params = params or DecompressParams()
    meta = None
    colorspace = None
    if jp2_mod.is_jp2(data):
        cs, meta, colorspace = jp2_mod.unwrap_jp2(data)
    else:
        cs = data
    dec = CodestreamDecoder(cs, strict=params.strict)
    dec.parse()
    img = dec.decode(params)
    if meta is not None:
        img.meta = meta
    if colorspace is not None:
        img.color_space = colorspace
    _postprocess(img, params)
    return img


def _postprocess(img: GrkImage, params: DecompressParams) -> None:
    """JP2-level post-processing: palette application, cdef reordering,
    sYCC conversion, precision overrides (GrkImage_Conversion parity,
    SURVEY.md §3.2 "post")."""
    from .util import color

    if img.meta.palette is not None and img.meta.palette.lut is not None:
        color.apply_palette(img)
    if img.meta.channel_definitions:
        color.apply_channel_definitions(img)
    if img.color_space == ColorSpace.SYCC and img.numcomps >= 3:
        color.sycc_to_rgb(img)
    if params.upsample:
        color.upsample_components(img)
    if params.force_rgb and img.numcomps == 1:
        img.comps = [img.comps[0], img.comps[0].copy(), img.comps[0].copy()]
        img.color_space = ColorSpace.SRGB
    if params.precision:
        color.shift_precision(img, params.precision)
