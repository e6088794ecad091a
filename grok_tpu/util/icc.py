"""Minimal ICC profile application for high-precision images.

Parity: the reference applies embedded ICC profiles through lcms2 at any
bit depth (ref: src/lib/core/util/GrkImage_Conversion.cpp [P]).  Pillow's
ImageCms only builds 8-bit transforms (verified on Pillow 12.1: every
16-bit mode fails with "cannot build transform"), so the >8-bit path here
evaluates the common matrix/TRC profile class directly in float64:

    device RGB --rTRC/gTRC/bTRC--> linear RGB --rXYZ/gXYZ/bXYZ--> XYZ(D50)
              --Bradford D50->D65--> XYZ(D65) --sRGB matrix + EOTF--> sRGB

Monochrome profiles use kTRC -> Y -> sRGB gray.  LUT-based profiles
(A2B0 et al.) are out of scope and fall back to the caller's warning
path.  Curve types handled: 'curv' (identity / u8.8 gamma / sampled
table) and 'para' (types 0-4, ICC.1 §10.18).
"""

from __future__ import annotations

import struct

import numpy as np

# Bradford-adapted D50 -> D65 chromatic adaptation (ICC PCS is D50)
_D50_TO_D65 = np.array([
    [0.9555766, -0.0230393, 0.0631636],
    [-0.0282895, 1.0099416, 0.0210077],
    [0.0122982, -0.0204830, 1.3299098]])

# XYZ(D65) -> linear sRGB
_XYZ_TO_SRGB = np.array([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252]])


class UnsupportedProfile(Exception):
    pass


def _tags(icc: bytes) -> dict[bytes, bytes]:
    if len(icc) < 132:
        raise UnsupportedProfile("profile too short")
    (count,) = struct.unpack(">I", icc[128:132])
    if count > 1024:
        raise UnsupportedProfile("implausible tag count")
    out = {}
    for i in range(count):
        off = 132 + 12 * i
        sig, toff, size = struct.unpack(">4sII", icc[off:off + 12])
        if toff + size > len(icc):
            raise UnsupportedProfile("tag out of bounds")
        out[sig] = icc[toff:toff + size]
    return out


def _xyz(tag: bytes) -> np.ndarray:
    if tag[:4] != b"XYZ " or len(tag) < 20:
        raise UnsupportedProfile("bad XYZ tag")
    return np.array(struct.unpack(">iii", tag[8:20]), dtype=np.float64) \
        / 65536.0


def _curve(tag: bytes):
    """Returns f(x)->linear for x in [0,1], vectorized."""
    kind = tag[:4]
    if kind == b"curv":
        (n,) = struct.unpack(">I", tag[8:12])
        if n == 0:
            return lambda x: x
        if n == 1:
            (g,) = struct.unpack(">H", tag[12:14])
            gamma = g / 256.0
            return lambda x: np.power(np.clip(x, 0.0, 1.0), gamma)
        table = np.frombuffer(tag[12:12 + 2 * n],
                              dtype=">u2").astype(np.float64) / 65535.0
        xs = np.linspace(0.0, 1.0, n)
        return lambda x: np.interp(np.clip(x, 0.0, 1.0), xs, table)
    if kind == b"para":
        (ftype,) = struct.unpack(">H", tag[8:10])
        nparams = {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}.get(ftype)
        if nparams is None:
            raise UnsupportedProfile("parametric curve type")
        vals = struct.unpack(f">{nparams}i",
                             tag[12:12 + 4 * nparams])
        g, a, b, c, d, e, f = (list(np.array(vals) / 65536.0)
                               + [0.0] * 7)[:7]

        def para(x, g=g, a=a, b=b, c=c, d=d, e=e, f=f, ftype=ftype):
            # a == 0 or a*x+b < 0 would produce inf/NaN; clamp the power
            # base at 0 (the ICC convention for out-of-domain input) and
            # the caller's finite check catches anything else
            x = np.clip(x, 0.0, 1.0)
            with np.errstate(invalid="ignore", divide="ignore"):
                pw = np.power(np.maximum(a * x + b, 0.0), g)
                # a == 0: the domain condition a*x+b >= 0 is constant —
                # always satisfied when b >= 0, never otherwise
                knee = ((-b / a) if a != 0.0
                        else (-np.inf if b >= 0.0 else np.inf))
                if ftype == 0:
                    return np.power(x, g)
                if ftype == 1:
                    return np.where(x >= knee, pw, 0.0)
                if ftype == 2:
                    return np.where(x >= knee, pw + c, c)
                if ftype == 3:
                    return np.where(x >= d, pw, c * x)
                return np.where(x >= d, pw + e, c * x + f)
        return para
    raise UnsupportedProfile("curve tag kind")


def _srgb_encode(lin: np.ndarray) -> np.ndarray:
    lin = np.clip(lin, 0.0, 1.0)
    return np.where(lin <= 0.0031308, 12.92 * lin,
                    1.055 * np.power(lin, 1 / 2.4) - 0.055)


def profile_to_srgb(planes: list[np.ndarray], icc: bytes,
                    prec: int) -> list[np.ndarray] | None:
    """Convert device planes (len 1 or 3, unsigned, `prec` bits) to sRGB
    at the same precision.  Returns None for profiles outside the
    matrix/TRC class (the caller warns and keeps the profile attached)."""
    try:
        tags = _tags(icc)
        peak = float((1 << prec) - 1)
        if len(planes) >= 3 and all(
                t in tags for t in (b"rXYZ", b"gXYZ", b"bXYZ",
                                    b"rTRC", b"gTRC", b"bTRC")):
            mat = np.stack([_xyz(tags[b"rXYZ"]), _xyz(tags[b"gXYZ"]),
                            _xyz(tags[b"bXYZ"])], axis=1)
            lin = [
                _curve(tags[t])(planes[i].astype(np.float64) / peak)
                for i, t in enumerate((b"rTRC", b"gTRC", b"bTRC"))]
            xyz_d50 = np.einsum("ij,jhw->ihw", mat, np.stack(lin))
            xyz_d65 = np.einsum("ij,jhw->ihw", _D50_TO_D65, xyz_d50)
            srgb_lin = np.einsum("ij,jhw->ihw", _XYZ_TO_SRGB, xyz_d65)
            if not np.isfinite(srgb_lin).all():
                # degenerate curves/matrices: keep the profile attached
                # rather than writing NaN/inf-derived samples (check
                # BEFORE the encode clip maps inf to 1.0)
                return None
            enc = _srgb_encode(srgb_lin)
            out = np.rint(enc * peak).astype(np.int64)
            return [np.clip(out[i], 0, int(peak)).astype(np.int32)
                    for i in range(3)] + [p for p in planes[3:]]
        if len(planes) >= 1 and b"kTRC" in tags:
            y = _curve(tags[b"kTRC"])(
                planes[0].astype(np.float64) / peak)
            if not np.isfinite(y).all():
                return None
            enc = _srgb_encode(y)
            out = np.clip(np.rint(enc * peak), 0, peak).astype(np.int32)
            return [out] + [p for p in planes[1:]]
        return None
    except UnsupportedProfile:
        return None
    except (struct.error, IndexError, ValueError):
        return None
