"""grok_tpu — TPU-native JPEG 2000 framework.

A clean-room, TPU-first reimplementation of the capabilities of
GrokImageCompression/Grok (ISO/IEC 15444-1 Part 1 + JP2 container + Part 15
HTJ2K): batched XLA/Pallas device kernels for color transform, wavelet
lifting and quantization, native C++ host modules for the serial entropy
stages (MQ / HT block coding), and Python orchestration for codestream and
container assembly.

Reference parity map: see SURVEY.md §2 (component inventory).  The reference
mount was empty at build time (SURVEY.md §0); behavior parity is established
against the OpenJPEG 2.5.x oracle bundled with Pillow.
"""

__version__ = "0.1.0"

from .image import GrkImage  # noqa: F401
from .params import CompressParams, DecompressParams  # noqa: F401


_CODEC_API = (
    "compress", "compress_strips", "compress_strips_file", "decompress",
    "read_header",
    "decompress_strips", "decompress_file", "compress_file",
    "decompress_stream", "compress_stream", "set_msg_handlers",
)
_ERRORS = ("GrkError", "CodestreamError", "ParamError")


def __getattr__(name):
    # codec imports jax lazily; keep top-level import light
    if name in _CODEC_API:
        from . import codec

        return getattr(codec, name)
    if name in _ERRORS:
        from . import errors

        return getattr(errors, name)
    raise AttributeError(name)
