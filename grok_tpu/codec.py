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
        return jp2_mod.wrap_jp2(cs, image, ht=params.ht)
    return cs


def compress_strips(image: GrkImage, reader,
                    params: CompressParams | None = None) -> bytes:
    """Streaming encode — the dual of decompress_strips.  `image` carries
    geometry/metadata only (component `data` may be None); `reader(y0, h)`
    is called once per tile row and must return one 2-D array per
    component covering canvas rows [y0, y0+h) at that component's
    subsampling (shape (ceil((y0+h)/dy) - ceil(y0/dy), comp.w)).  Peak
    memory is O(tile row), not O(image) — the gigapixel encode path."""
    params = params or CompressParams()
    cs = compress_codestream(image, params, strip_reader=reader)
    if params.cod_format == "jp2":
        return jp2_mod.wrap_jp2(cs, image, ht=params.ht)
    return cs


def compress_strips_file(image: GrkImage, reader, path: str,
                         params: CompressParams | None = None) -> int:
    """compress_strips straight to a file: tile-parts stream to disk as
    they are produced and the TLM index is patched by seek-back, so
    neither the canvas NOR the codestream is ever held in memory.
    Returns the bytes written.  PPM/PLM (post-hoc main-header indexes)
    are rejected; use ppt/plt."""
    params = params or CompressParams()
    with open(path, "wb") as f:
        if params.cod_format == "jp2":
            # jp2c LBox=0: codestream runs to end of file (I.5.1)
            f.write(jp2_mod.jp2_prefix(image, ht=params.ht))
        compress_codestream(image, params, strip_reader=reader, sink=f)
        return f.tell()


def read_header(data: bytes, strict: bool = False,
                lazy: bool = True) -> HeaderInfo:
    """Parse the container + codestream headers without decoding tiles
    (grk_decompress_read_header parity; basis of grk_dump).  lazy=False
    forces scanning every tile-part even when a TLM index would let the
    decoder skip them (grk_dump needs the full SOT layout)."""
    if jp2_mod.is_jp2(data):
        cs, meta, colorspace = jp2_mod.unwrap_jp2(data)
    else:
        cs, meta, colorspace = data, None, None
    dec = CodestreamDecoder(cs, strict=strict)
    hi = dec.parse()
    if not lazy:
        # materialize in stream order so the marker log reads naturally
        order = sorted((sp[0], t) for t, sps in dec._lazy_spans.items()
                       for sp in sps)
        for _, tidx in order:
            dec._ensure_tile(tidx)
    if meta is not None:
        hi.image.meta = meta
    if colorspace is not None:
        hi.image.color_space = colorspace
    hi._decoder = dec  # cached for a subsequent decompress() call
    return hi


def decompress(data: bytes, params: DecompressParams | None = None,
               cache=None) -> GrkImage:
    """Decode a raw codestream or JP2 file to a GrkImage.  Pass a
    util.caches.TileCache to serve repeated multi-window/tile requests
    from cache (TileCache parity)."""
    params = params or DecompressParams()
    meta = None
    colorspace = None
    if jp2_mod.is_jp2(data):
        cs, meta, colorspace = jp2_mod.unwrap_jp2(data)
    else:
        cs = data
    dec = CodestreamDecoder(cs, strict=params.strict)
    dec.parse()
    img = dec.decode(params, cache=cache)
    if meta is not None:
        img.meta = meta
    if colorspace is not None:
        img.color_space = colorspace
    _postprocess(img, params)
    return img


def decompress_strips(data: bytes, params: DecompressParams | None = None,
                      strip_height: int | None = None,
                      header: HeaderInfo | None = None):
    """Strip-streaming decode generator (StripCache parity, SURVEY.md §2.1):
    yields (y0, {compno: strip ndarray}) — one tile row at a time by
    default, or `strip_height` canvas rows at a time via the window-aware
    decode path (memory O(strip) even inside huge tiles) — the gigapixel
    decode path.  Pass the HeaderInfo from read_header(data) to reuse its
    parsed state instead of re-scanning the headers."""
    params = params or DecompressParams()
    dec = getattr(header, "_decoder", None) if header is not None else None
    if dec is None:
        cs = jp2_mod.unwrap_jp2(data)[0] if jp2_mod.is_jp2(data) else data
        dec = CodestreamDecoder(cs, strict=params.strict)
        dec.parse()
    yield from dec.decode_strips(params, strip_height=strip_height)


def decompress_file(path: str, params: DecompressParams | None = None,
                    cache=None) -> GrkImage:
    """Decode straight from a file through a memory map (MemStream parity,
    SURVEY.md §2.1 "Streams & memory"): tile data is touched lazily, so
    region/tile decodes of large files only fault in the pages they use."""
    import mmap

    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        # no explicit close: the map is released by refcount once the
        # decoder's slices over it are collected (closing earlier would
        # invalidate exported views)
        return decompress(memoryview(mm), params, cache=cache)


def compress_file(image: GrkImage, path: str,
                  params: CompressParams | None = None) -> int:
    """Encode to a file; returns the byte count."""
    data = compress(image, params)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def decompress_stream(stream, params: DecompressParams | None = None,
                      cache=None) -> GrkImage:
    """Decode from a user stream object (grk_stream_params callback-stream
    parity, SURVEY.md §2.1 "Public API"): anything with read() — a file
    object, socket wrapper, BytesIO — or with a buffer protocol."""
    if hasattr(stream, "read"):
        data = stream.read()
    else:
        data = stream
    return decompress(data, params, cache=cache)


def compress_stream(image: GrkImage, stream,
                    params: CompressParams | None = None) -> int:
    """Encode to a user stream object with write(); returns byte count."""
    data = compress(image, params)
    stream.write(data)
    return len(data)


# ---------------------------------------------------------------- logging

def set_msg_handlers(info=None, warn=None, error=None) -> None:
    """grk_set_msg_handlers parity (SURVEY.md §2.1 "Logging"): route codec
    messages to user callbacks."""
    logger = logging.getLogger("grok_tpu")

    class _Handler(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if record.levelno >= logging.ERROR and error:
                error(msg)
            elif record.levelno >= logging.WARNING and warn:
                warn(msg)
            elif info:
                info(msg)

    for h in list(logger.handlers):
        if isinstance(h, _Handler) or h.__class__.__name__ == "_Handler":
            logger.removeHandler(h)
    logger.addHandler(_Handler())
    logger.setLevel(logging.INFO)


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
    elif img.color_space == ColorSpace.EYCC and img.numcomps >= 3:
        color.eycc_to_rgb(img)
    elif img.color_space == ColorSpace.CMYK and img.numcomps >= 4 and \
            params.force_rgb and not (params.apply_icc
                                      and img.meta.icc_profile):
        # an embedded CMYK ICC profile supersedes the naive ink formula;
        # the apply_icc step below consumes it (falling back afterwards
        # if the profile turns out unsupported)
        color.cmyk_to_rgb(img)
    elif img.color_space == ColorSpace.CIELAB and img.numcomps >= 3:
        color.cielab_to_srgb(img)
    if params.upsample:
        color.upsample_components(img)
    if params.force_rgb and img.numcomps == 1:
        img.comps = [img.comps[0], img.comps[0].copy(), img.comps[0].copy()]
        img.color_space = ColorSpace.SRGB
    if params.apply_icc and img.meta.icc_profile:
        color.apply_icc_profile(img)
    if img.color_space == ColorSpace.CMYK and img.numcomps >= 4 and \
            params.force_rgb:
        # ICC application declined (unsupported profile class): honor
        # force_rgb with the naive ink conversion instead
        color.cmyk_to_rgb(img)
    if params.precision:
        color.shift_precision(img, params.precision)
