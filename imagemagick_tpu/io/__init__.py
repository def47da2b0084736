"""Format registry + read/write entry points.

Mirrors the constitute layer (/root/reference/MagickCore/constitute.c:
ReadImage at :607, WriteImage at :1217) and the coder registry
(/root/reference/MagickCore/magick.c: GetMagickInfo at :605): filenames may
carry an explicit ``fmt:`` prefix, otherwise the extension and then magic
bytes decide (SetImageInfo, image.c:2789 + magic.c sniffing).

Pseudo formats synthesize device arrays directly (pseudo.py); MIFF/PNM are
native; everything else goes through the host codec bridge (codecs.py).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Union

import numpy as np

from ..core.image import Image
from . import (codecs, coders_r4, coders_r4b, delegates, dng, emf, exr, extra_coders,
               formats2, formats3, formats4, miff, mpc, pnm, pseudo)
from ..core.geometry import parse_geometry

__all__ = ["read_image", "read_images", "write_image", "image_from_blob",
           "image_to_blob", "detect_format", "supported_read_formats",
           "supported_write_formats"]

# magic-byte sniffing table (magic.c analog)
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"RIFF", "webp"),
    (b"id=ImageMagick", "miff"),
    (b"P1", "pnm"), (b"P2", "pnm"), (b"P3", "pnm"), (b"P4", "pnm"),
    (b"P5", "pnm"), (b"P6", "pnm"), (b"P7", "pam"), (b"PF", "pfm"), (b"Pf", "pfm"),
    (b"qoif", "qoi"),
    (b"8BPS", "psd"),
    # ICO handled below with a count-field sanity check (the 4-byte
    # magic alone collides with e.g. 1-wide ART headers)
    (b"SDPX", "dpx"),
    (b"XPDS", "dpx"),
    (b"\x80\x2a\x5f\xd7", "cin"),
    (b"\xd7\x5f\x2a\x80", "cin"),
    (b"gimp xcf ", "xcf"),
    (b"SIMPLE", "fits"),
    (b"L32F", "fl32"),
    (b"LBLSIZE=", "vicar"),
    (b"\x59\xa6\x6a\x95", "sun"),
    (b"MATLAB 5.0 MAT-file", "mat"),
    (b"\xab\x01", "viff"),
    (b"\xb6\xa6\xf2\x08", "vips"),
    (b"\x08\xf2\xa6\xb6", "vips"),
    (b"PG ", "pgx"),
    (b"data:", "inline"),
    (b"# ImageMagick pixel enumeration", "txt"),
    (b"srcdocid:", "cals"),
    (b"\x52\xcc", "rle"),
    (b"\xc5\xd0\xd3\xc6", "ept"),
    (b"\xff\x57\x50\x43", "wpg"),
    (b"iiii", "ipl"),
    (b"mmmm", "ipl"),
    (b"TIM2", "tim2"),
    (b"#PES", "pes"),
    (b"\xd7\xcd\xc6\x9a", "wmf"),   # placeable metafile key (wmf.c)
    (b"AT&TFORM", "djvu"),
    (b"FLIF", "flif"),
]

_PSEUDO = {
    "xc": lambda arg, w, h: pseudo.xc(arg or "white", w or 1, h or 1),
    "canvas": lambda arg, w, h: pseudo.xc(arg or "white", w or 1, h or 1),
    "gradient": lambda arg, w, h: pseudo.gradient(arg or "white-black", w or 256, h or 256),
    "radial-gradient": lambda arg, w, h: pseudo.radial_gradient(arg or "white-black", w or 256, h or 256),
    "plasma": lambda arg, w, h: pseudo.plasma(arg or "", w or 256, h or 256),
    "pattern": lambda arg, w, h: pseudo.pattern(arg or "checkerboard", w or 256, h or 256),
    "hald": lambda arg, w, h: pseudo.hald(int(arg) if arg else 8),
    "logo": lambda arg, w, h: pseudo.logo(),
    "rose": lambda arg, w, h: pseudo.rose(),
    "wizard": lambda arg, w, h: pseudo.wizard(),
    "granite": lambda arg, w, h: pseudo.granite(),
    "netscape": lambda arg, w, h: pseudo.netscape(),
    "null": lambda arg, w, h: _null_image(w, h),
    "label": lambda arg, w, h: pseudo.label(arg or "", w, h, _CURRENT_SETTINGS),
    "caption": lambda arg, w, h: pseudo.caption(arg or "", w, h,
                                                _CURRENT_SETTINGS),
    "tile": lambda arg, w, h: pseudo.tile_file(arg, w, h, _CURRENT_SETTINGS),
    "histogram": lambda arg, w, h: pseudo.histogram_file(arg, w, h,
                                                         _CURRENT_SETTINGS),
    "thumbnail": lambda arg, w, h: pseudo.thumbnail_file(arg, w, h,
                                                         _CURRENT_SETTINGS),
    "stegano": lambda arg, w, h: pseudo.stegano_file(arg, w, h,
                                                     _CURRENT_SETTINGS),
    "vid": lambda arg, w, h: pseudo.vid_file(arg, w, h, _CURRENT_SETTINGS),
    # round-4 pseudo-coders (coders/kernel.c inverse, coders/pango.c)
    "kernel": lambda arg, w, h: coders_r4.kernel_pseudo(arg or "unity"),
    "pango": lambda arg, w, h: coders_r4.pango_pseudo(arg or "", w, h,
                                                      _CURRENT_SETTINGS),
    # strimg.c: the filename string as a 1-row image
    "strimg": lambda arg, w, h: coders_r4b.strimg_pseudo(arg or ""),
}

def _null_image(w, h):
    img = pseudo.xc("transparent", w or 1, h or 1)
    img.properties["null-separator"] = "1"   # -layers composite marker
    return img


# settings context for pseudo-coders (pointsize/font/fill/background);
# set per read_images call — the image_info analog label.c reads from.
_CURRENT_SETTINGS: dict = {}

_NATIVE_EXT = {"miff": "miff", "mif": "miff",
               "ppm": "pnm", "pgm": "pnm", "pbm": "pnm", "pnm": "pnm",
               "pam": "pnm", "pfm": "pnm",
               "ff": "ff", "farbfeld": "ff", "xbm": "xbm", "xpm": "xpm",
               "svg": "svg", "sixel": "sixel", "six": "sixel",
               "gray": "raw", "rgb": "raw", "rgba": "raw", "bgr": "raw",
               "exr": "exr", "hdr": "hdr", "mpc": "mpc"}

# in-memory registry for mpr: (registry.c:457 SetImageRegistry analog)
_MPR_REGISTRY = {}


def detect_format(data: bytes) -> Optional[str]:
    for magic, fmt in _MAGIC:
        if data[: len(magic)] == magic:
            if fmt == "webp" and data[8:12] != b"WEBP":
                continue
            return fmt
    if data[:4] == b"\x01\x00\x00\x00" and data[40:44] == b" EMF":
        return "emf"   # EMR_HEADER iType + dSignature (emf.c IsEMF)
    if data[:4] == b"\x00\x00\x01\x00" and len(data) > 6:
        count = data[4] | (data[5] << 8)
        if 0 < count <= 0x40:
            return "ico"
    if data[4:12] in (b"ftypavif", b"ftypheic", b"ftypheix", b"ftypmif1",
                      b"ftypmsf1", b"ftypheim", b"ftyphevc"):
        return "avif" if b"avif" in data[4:12] else "heic"
    if data[:2] == b"\xff\x0a" or \
            data[:12] == b"\x00\x00\x00\x0cJXL \r\n\x87\n":
        return "jxl"
    if data[:4] == b"PK\x03\x04" and b"image/openraster" in data[:128]:
        return "ora"   # zip whose stored-first mimetype entry is ORA
    if data[:8] == b"farbfeld":
        return "ff"
    if data[:4] == b"\x76\x2f\x31\x01":
        return "exr"
    if data[:11] == b"#?RADIANCE\n" or data[:7] == b"#?RGBE\n":
        return "hdr"
    head = data[:512].lstrip()
    if head.startswith(b"/* XPM */"):
        return "xpm"
    if head.startswith(b"#define") and b"_bits[]" in data[:4096]:
        return "xbm"
    if head.startswith(b"<?xml") and b"<svg" in data[:4096] or head.startswith(b"<svg"):
        return "svg"
    if data[:4] == b"%PDF":
        return "pdf"
    if data[:2] == b"%!":
        return "ps"
    if data[128:132] == b"DICM":
        return "dcm"
    if data[:5] == b"SFW95":
        return "pwp"
    if data[:3] == b"SFW":
        return "sfw"
    if data[:4] in (b"\x00\x01\x00\x00", b"OTTO", b"true", b"ttcf") \
            and len(data) > 512:
        return "ttf"
    if data[60:68] == b"vIMGView":
        return "pdb"
    if data[80:82] == b"CT" and len(data) > 2048 and data[:4] != b"\x00\x00\x00\x00":
        # Scitex CT parameter block (sct.c IsSCT probes offset 80)
        try:
            int(float(data[1056:1068].split(b"\x00")[0] or b"x"))
            return "sct"
        except ValueError:
            pass
    if data[4:8] == b"\x00\x00\x00\x07" and len(data) >= 100:
        import struct as _s

        if _s.unpack(">I", data[:4])[0] >= 100:
            return "xwd"
    return None


def _fetch_url(url: str, timeout: float = 30.0) -> bytes:
    """Fetch a url:/http:/https:/ftp:/file: blob (the reference's curl
    delegate, delegates.xml.in:66-67), honoring the policy 'delegate'
    domain before touching the network (constitute.c:733 analog)."""
    from urllib.error import URLError
    from urllib.request import urlopen

    from ..core.policy import policy as _pol

    scheme = url.split(":", 1)[0].lower()
    _pol.enforce("delegate", scheme.upper(), "read")
    try:
        with urlopen(url, timeout=timeout) as r:
            return r.read()
    except URLError as exc:
        raise IOError(f"url fetch failed for {url!r}: {exc}") from exc


def _split_filename(filename: str):
    """'fmt:rest' prefix split (SetImageInfo filename syntax)."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9_+-]*):(.*)$", filename)
    if m and (m.group(1).lower() in _PSEUDO or m.group(1).lower() in
              set(_NATIVE_EXT) | set(codecs._PIL_FORMATS)
              | _FORMATS2_READ | _FORMATS2_WRITE
              | {"mpr", "info", "txt", "json", "dng",
                 "url", "http", "https", "ftp", "file",
                 "mask", "clip", "ora", "kernel", "pango",
                 "strimg", "debug", "matte", "dmr", "wmf", "emf"}
              | set(coders_r4b._META_PROFILE) | _VIDEO_FMTS):
        return m.group(1).lower(), m.group(2)
    return None, filename


def read_images(filename: str, size: Optional[str] = None,
                settings: Optional[dict] = None) -> List[Image]:
    fmt, rest = _split_filename(str(filename))
    if rest == "-":   # stdin (cli-pipe.tap semantics)
        import sys

        return image_from_blob(sys.stdin.buffer.read(), fmt)
    w = h = None
    if size:
        g = parse_geometry(size)
        w = int(g.width) if g.width else None
        h = int(g.height) if g.height else None
    if fmt in _PSEUDO:
        global _CURRENT_SETTINGS
        prev = _CURRENT_SETTINGS
        _CURRENT_SETTINGS = settings or prev
        try:
            return [_PSEUDO[fmt](rest, w, h)]
        finally:
            _CURRENT_SETTINGS = prev
    if fmt == "mpr":
        if rest not in _MPR_REGISTRY:
            raise FileNotFoundError(f"no mpr registry entry {rest!r}")
        return list(_MPR_REGISTRY[rest])
    if fmt == "dmr":
        # dmr.c:101 ReadDMRImage: repository IRI -> resource
        return coders_r4b.read_dmr(rest, settings)
    if fmt in ("mask", "clip"):
        # coders/mask.c:236 / coders/clip.c: decode the underlying file,
        # then surface the grayscale raster / rasterized 8BIM clip path
        inner = read_images(rest, size, settings)
        return coders_r4.read_mask(inner) if fmt == "mask" \
            else coders_r4.read_clip(inner)
    if (fmt in _VIDEO_FMTS or (fmt is None and
            os.path.splitext(rest)[1].lstrip(".").lower() in _VIDEO_FMTS)) \
            and os.path.exists(rest.split("[")[0]):
        # coders/video.c read side: ffmpeg frame extraction delegate
        return delegates.decode_video_frames(rest.split("[")[0])
    if fmt in ("url", "http", "https", "ftp", "file"):
        # url.c / the curl delegate rule (delegates.xml.in:66-67): fetch
        # the blob over the network (or file://) into the normal decode
        # path.  Gated by the policy "delegate" domain like the reference
        # gates its delegate invocation (policy.c:623).
        target = rest if fmt == "url" else f"{fmt}:{rest}"
        return image_from_blob(_fetch_url(target))
    if (fmt == "mpc" or rest.lower().endswith(".mpc")) and os.path.exists(rest):
        return mpc.read_mpc(rest)
    with open(rest, "rb") as f:
        data = f.read()
    ext = fmt or os.path.splitext(rest)[1].lstrip(".").lower()
    if ext in coders_r4b._META_PROFILE:
        # meta.c:1198 ReadMETAImage: the blob as a 1x1 image's profile
        return [coders_r4b.decode_meta(data, ext)]
    if ext in ("dot", "gv"):
        return delegates.decode_dot(data)
    if ext == "pcl":
        return delegates.decode_pcl(data)
    if ext == "xps":
        return delegates.decode_xps(data)
    if ext in ("doc", "docx", "odt", "ppt", "pptx", "xls", "xlsx"):
        return delegates.decode_office(data, ext)
    if ext in ("gray", "rgb", "rgba", "bgr", "bgra", "cmyk",
               "ycbcr") and w and h:
        return [extra_coders.decode_raw(data, ext, w, h)]
    if ext in ("raw", "r") and w and h:
        # raw.c: single-channel quantum stream
        return [extra_coders.decode_raw(data, "gray", w, h)]
    if ext == "mono" and w and h:
        return [formats2.decode_mono(data, w, h)]
    if ext == "uyvy" and w and h:
        return [formats4.decode_uyvy(data, w, h)]
    if ext == "yuv" and w and h:
        return [formats4.decode_yuv(data, w, h)]
    if ext == "bayer" and w and h:
        return [formats4.decode_bayer(data, w, h)]
    if ext == "map" and w and h:
        return [formats4.decode_map(data, w, h)]
    return image_from_blob(data, ext)


def read_image(filename: str, size: Optional[str] = None) -> Image:
    return read_images(filename, size)[0]


def image_from_blob(data: bytes, fmt: Optional[str] = None) -> List[Image]:
    from ..core.policy import policy
    from ..core.resource import resources

    sniffed = detect_format(data)
    use = sniffed or (fmt.lower() if fmt else None)
    if use is None:
        raise ValueError("cannot determine image format")
    policy.enforce("coder", use.upper(), "read")
    if use == "miff":
        images = miff.decode(data)
    elif use in ("pnm", "ppm", "pgm", "pbm", "pam", "pfm"):
        images = [pnm.decode(data)]
    elif use in ("ff", "farbfeld"):
        images = [extra_coders.decode_farbfeld(data)]
    elif use == "xbm":
        images = [extra_coders.decode_xbm(data)]
    elif use == "xpm":
        images = [extra_coders.decode_xpm(data)]
    elif use == "svg":
        images = [extra_coders.decode_svg(data)]
    elif use == "ora":
        images = coders_r4.decode_ora(data)
    elif use == "kernel":
        # ReadKERNELImage inverse of WriteKERNELImage (coders/kernel.c):
        # the written 'WxH:v,v,...' text is itself a valid
        # AcquireKernelInfo spec — parse it back through the pseudo-read
        # (values min-max normalized, '-' taps transparent, as the
        # reference's kernel-image rendering does).
        images = [coders_r4.kernel_pseudo(
            data.decode("ascii", "replace").strip())]
    elif use == "wmf":
        images = [coders_r4b.decode_wmf(data)]
    elif use == "emf":
        images = [emf.decode_emf(data)]
    elif use in ("jbig", "jbg", "bie"):
        images = [coders_r4b.decode_jbig(data)]
    elif use in ("djvu", "flif", "fpx"):
        # recognized but delegate-library-gated, exactly like a reference
        # build without libdjvu/libflif/libfpx (coders/djvu.c etc. are
        # compiled out and SetImageInfo raises the same error class)
        raise ValueError(
            f"DelegateLibrarySupportNotBuiltIn `{use.upper()}'")
    elif use == "strimg":
        images = [coders_r4b.strimg_pseudo(
            data.decode("utf-8", "replace").rstrip("\n"))]
    elif use in coders_r4b._META_PROFILE:
        images = [coders_r4b.decode_meta(data, use)]
    elif use == "exr":
        images = [exr.decode(data)]
    elif use == "hdr":
        images = [_decode_hdr(data)]
    elif use == "dpx":
        images = [formats2.decode_dpx(data)]
    elif use == "cin":
        images = [formats2.decode_cin(data)]
    elif use in ("dcm", "dicom"):
        images = [formats2.decode_dcm(data)]
    elif use == "xcf":
        images = [formats2.decode_xcf(data)]
    elif use == "sun":
        images = [formats2.decode_sun(data)]
    elif use == "fits" or use == "fts":
        images = [formats2.decode_fits(data)]
    elif use == "wbmp":
        images = [formats2.decode_wbmp(data)]
    elif use == "avs":
        images = [formats2.decode_avs(data)]
    elif use == "mtv":
        images = [formats2.decode_mtv(data)]
    elif use == "fl32":
        images = [formats2.decode_fl32(data)]
    elif use in ("vicar", "vic"):
        images = [formats2.decode_vicar(data)]
    elif use == "otb":
        images = [formats2.decode_otb(data)]
    elif use in ("fax", "g3"):
        images = [formats2.decode_fax(data)]
    elif use == "g4":
        images = [formats2.decode_g4_image(data)]
    elif use == "mat":
        images = formats3.decode_mat(data)
    elif use in ("viff", "xv", "vif"):
        images = [formats3.decode_viff(data)]
    elif use == "rla":
        images = [formats3.decode_rla(data)]
    elif use == "palm":
        images = [formats3.decode_palm(data)]
    elif use in ("pict", "pct"):
        images = [formats3.decode_pict(data)]
    elif use == "aai":
        images = [formats4.decode_aai(data)]
    elif use == "hrz":
        images = [formats4.decode_hrz(data)]
    elif use == "scr":
        images = [formats4.decode_scr(data)]
    elif use == "rgf":
        images = [formats4.decode_rgf(data)]
    elif use == "txt" or use == "text":
        images = [formats4.decode_txt(data)]
    elif use == "inline":
        images = formats4.decode_inline(data)
    elif use == "pgx":
        images = [formats4.decode_pgx(data)]
    elif use in ("vips", "v"):
        images = [formats4.decode_vips(data)]
    elif use in ("cals", "cal"):
        images = [formats4.decode_cals(data)]
    elif use == "art":
        images = [formats4.decode_art(data)]
    elif use == "sct":
        images = [formats4.decode_sct(data)]
    elif use == "xwd":
        images = [formats4.decode_xwd(data)]
    elif use == "sfw":
        images = formats4.decode_sfw(data)
    elif use == "pdb":
        images = [formats4.decode_pdb(data)]
    elif use == "tim":
        images = formats4.decode_tim(data)
    elif use == "cube":
        images = [formats4.decode_cube(data)]
    elif use == "pwp":
        images = formats4.decode_pwp(data)
    elif use == "mvg":
        images = [formats4.decode_mvg(data)]
    elif use in ("ttf", "otf", "ttc"):
        images = [formats4.decode_ttf(data)]
    elif use == "cut":
        images = [formats4.decode_cut(data)]
    elif use == "rle":
        images = [formats4.decode_rle(data)]
    elif use == "mac":
        images = [formats4.decode_mac(data)]
    elif use == "pix":
        images = [formats4.decode_pix(data)]
    elif use in ("ept", "ept2", "ept3"):
        images = formats4.decode_ept(data)
    elif use == "wpg":
        images = [formats4.decode_wpg(data)]
    elif use == "ipl":
        images = formats4.decode_ipl(data)
    elif use == "ftxt":
        images = [formats4.decode_ftxt(data)]
    elif use == "magick" or use == "h":
        images = formats4.decode_magick(data)
    elif use == "tim2":
        images = formats4.decode_tim2(data)
    elif use == "jnx":
        images = formats4.decode_jnx(data)
    elif use == "pes":
        images = [formats4.decode_pes(data)]
    elif use == "uhdr":
        # Ultra HDR is a JPEG with an embedded gainmap; decode the base
        images = codecs.decode(data, "jpeg")
    elif use in ("pdf", "ps", "eps"):
        images = delegates.decode_postscript(data, use)
    elif use == "dng":
        # native CFA demosaic first; exotic raws (compressed/lossy DNG,
        # vendor raws renamed .dng) fall back to the dcraw/darktable
        # delegate chain when a binary exists (delegates.xml.in:68-70)
        try:
            images = [dng.decode_dng(data)]
        except ValueError:
            if not delegates.has_dcraw():
                raise
            images = delegates.decode_dcraw(data, "dng")
    else:
        images = None
        if use in ("tiff", "tif") and dng.is_dng(data):
            # DNG shares the TIFF magic; route CFA raws to the native
            # raw pipeline (coders/dng.c / dcraw delegate analog)
            images = [dng.decode_dng(data)]
        if images is None and use in ("tiff", "tif"):
            # Pillow silently truncates 48-bit RGB TIFF to 8-bit; take
            # the native deep reader first and fall back for everything
            # it does not cover (compressed, sub-16-bit, multi-strip)
            try:
                images = [formats4.decode_tiff16(data)]
            except Exception:
                images = None
        if images is None:
            images = codecs.decode(data, use)
    if use in ("jpeg", "jpg", "png", "tiff", "tif"):
        from ..core.metadata import extract_metadata

        meta = extract_metadata(data, use)
        for im in images:
            for k, v in meta.items():
                im.properties.setdefault(k, v)
    for im in images:
        im.properties.setdefault("format", use.upper())
        resources.check_image_size(im.width, im.height)
    return images


def write_image(image: Union[Image, List[Image]], filename: str,
                quality: int = 92, depth: Optional[int] = None,
                settings: Optional[dict] = None) -> None:
    fmt, rest = _split_filename(str(filename))
    images = image if isinstance(image, list) else [image]
    if fmt == "mpr":
        _MPR_REGISTRY[rest] = list(images)
        return
    if fmt == "dmr":
        coders_r4b.write_dmr(images, rest, settings)
        return
    if fmt in ("null",):
        return
    if fmt == "mpc" or (fmt is None and rest.lower().endswith(".mpc")):
        mpc.write_mpc(images, rest)
        return
    if fmt == "mask":
        # coders/mask.c:311 WriteMASKImage: write the image's mask raster
        # in the format the remaining filename implies
        write_image([coders_r4.write_mask_image(im) for im in images],
                    rest, quality=quality, depth=depth)
        return
    if fmt in ("info", "json", "yaml", "txt") and rest in ("", "-"):
        from . import identify as ident

        for im in images:
            if fmt == "json":
                print(ident.to_json(im, rest))
            elif fmt == "txt":
                print(_enumerate_pixels(im))
            else:
                print(ident.describe(im, rest, verbose=True))
        return
    if fmt is None:
        fmt = os.path.splitext(rest)[1].lstrip(".").lower()
    from ..core.policy import policy as _policy

    _policy.enforce("coder", fmt.upper(), "write")
    # WriteImages (constitute.c): when the coder cannot adjoin multiple
    # frames, expand the filename per scene — honor a %d template, else
    # insert -N before the extension ("sep.png" -> "sep-0.png" ...)
    _ADJOIN = {"gif", "tif", "tiff", "miff", "mng", "pdf", "ps", "ps2",
               "ps3", "webp", "ico", "dcm", "heic", "heif", "avif",
               "apng", "mpc", "fax", "g3", "g4", "pbm", "pgm", "ppm",
               "pnm", "pam", "mpeg", "mp4", "avi", "mkv", "mov", "ype",
               "null", "txt", "json", "yaml", "info"}
    if len(images) > 1 and rest != "-" and fmt not in _ADJOIN:
        if re.search(r"%0?\d*d", rest):
            names = [re.sub(r"%0?\d*d", lambda m, i=i:
                            ("%" + m.group(0)[1:]) % i, rest)
                     for i in range(len(images))]
        else:
            stem, ext = os.path.splitext(rest)
            names = [f"{stem}-{i}{ext}" for i in range(len(images))]
        for im, name in zip(images, names):
            blob = image_to_blob([im], fmt, quality=quality, depth=depth)
            with open(name, "wb") as f:
                f.write(blob)
        return
    blob = image_to_blob(images, fmt, quality=quality, depth=depth)
    if rest == "-":   # stdout (cli-pipe.tap semantics)
        import sys

        sys.stdout.buffer.write(blob)
        sys.stdout.buffer.flush()
        return
    with open(rest, "wb") as f:
        f.write(blob)


def _enumerate_pixels(im) -> str:
    """txt: coder — pixel enumeration (coders/txt.c)."""
    import numpy as np

    arr = np.asarray(im.data)
    if arr.ndim == 4:
        arr = arr[0]
    h, w, c = arr.shape
    lines = [f"# ImageMagick pixel enumeration: {w},{h},255,srgb"]
    for y in range(h):
        for x in range(w):
            px = arr[y, x]
            rgb = ",".join(str(int(v * 255 + 0.5)) for v in px[:3])
            lines.append(f"{x},{y}: ({rgb})")
    return "\n".join(lines)


# IssRGBCompatibleColorspace (colorspace-private.h:1763): colorspaces a
# raster coder can store verbatim; anything else is transformed to sRGB
# at write time (e.g. png.c:8283)
_SRGB_COMPAT = {"srgb", "rgb", "adobe98", "prophoto", "displayp3",
                "scrgb", "transparent", "gray", "lineargray",
                "linear-gray", "linear_gray"}
# formats that persist the colorspace tag (or support CMYK) themselves
_RAW_CS_FORMATS = {"miff", "mif", "mpc", "info", "json", "yaml", "txt",
                   "pfm", "null", "ype"}


def _to_srgb_for_write(images: List[Image], fmt: str) -> List[Image]:
    out = []
    for im in images:
        cs_name = (im.spec.colorspace or "srgb").lower()
        if cs_name in _SRGB_COMPAT or fmt in _RAW_CS_FORMATS:
            out.append(im)
            continue
        if cs_name == "cmyk" and fmt in ("jpeg", "jpg", "tiff", "tif",
                                         "psd", "pdf", "eps"):
            out.append(im)
            continue
        from ..ops import colorspace as cs_ops

        nc = im.spec.color_channels
        import jax.numpy as jnp

        color = cs_ops.convert(im.data[..., :nc], cs_name, "srgb")
        rest = im.data[..., nc:]
        data = jnp.concatenate([color[..., :3], rest], -1) \
            if rest.shape[-1] else color[..., :3]
        out.append(im.replace(data=data,
                              spec=im.spec.with_(colorspace="srgb")))
    return out


def image_to_blob(image: Union[Image, List[Image]], fmt: str,
                  quality: int = 92, depth: Optional[int] = None) -> bytes:
    images = image if isinstance(image, list) else [image]
    fmt = fmt.lower()
    depth = depth or images[0].spec.depth
    images = _to_srgb_for_write(images, fmt)
    if fmt in ("info", "json", "yaml", "txt"):
        from . import identify as ident

        parts = []
        for im in images:
            if fmt == "json":
                parts.append(ident.to_json(im, ""))
            elif fmt == "txt":
                parts.append(_enumerate_pixels(im))
            else:
                parts.append(ident.describe(im, "", verbose=True))
        return ("\n".join(parts) + "\n").encode()
    if fmt in ("miff", "mif"):
        return miff.encode(images, depth=16 if depth > 8 else 8, compression="zip")
    if fmt in ("ppm", "pgm", "pbm", "pnm", "pam", "pfm"):
        return pnm.encode(images[0], fmt, depth=depth)
    if fmt in ("ff", "farbfeld"):
        return extra_coders.encode_farbfeld(images[0])
    if fmt == "xbm":
        return extra_coders.encode_xbm(images[0])
    if fmt == "xpm":
        return extra_coders.encode_xpm(images[0])
    if fmt in ("sixel", "six"):
        return extra_coders.encode_sixel(images[0])
    if fmt in ("gray", "rgb", "rgba", "bgr", "bgra", "cmyk", "ycbcr", "uyvy"):
        return extra_coders.encode_raw(images[0], fmt, depth=depth or 8)
    if fmt == "otb":
        return formats2.encode_otb(images[0])
    if fmt == "mono":
        return formats2.encode_mono(images[0])
    if fmt in ("fax", "g3"):
        return formats2.encode_fax(images[0])
    if fmt == "g4":
        return formats2.encode_g4_image(images[0])
    if fmt == "exr":
        return exr.encode(images[0])
    if fmt == "hdr":
        return _encode_hdr(images[0])
    if fmt == "dpx":
        return formats2.encode_dpx(images[0], bits=10 if depth > 8 else 8)
    if fmt == "psd":
        # 8-bit by default for maximum reader interop (16-bit available
        # via formats2.encode_psd directly)
        return formats2.encode_psd(images[0], depth=8)
    if fmt == "dng":
        return dng.encode_dng(images[0])
    if fmt == "pdf":
        return formats2.encode_pdf(images)
    if fmt in ("fits", "fts"):
        return formats2.encode_fits(images[0])
    if fmt == "wbmp":
        return formats2.encode_wbmp(images[0])
    if fmt == "avs":
        return formats2.encode_avs(images[0])
    if fmt == "mtv":
        return formats2.encode_mtv(images[0])
    if fmt == "fl32":
        return formats2.encode_fl32(images[0])
    if fmt in ("vicar", "vic"):
        return formats2.encode_vicar(images[0])
    if fmt == "sun":
        return formats2.encode_sun(images[0])
    if fmt == "mat":
        return formats3.encode_mat(images[0], depth=depth)
    if fmt in ("tiff", "tif") and depth > 8 and len(images) == 1 \
            and not images[0].profiles:
        # Pillow cannot save 48-bit RGB TIFF; use the native writer
        return formats4.encode_tiff16(images[0])
    if fmt in ("viff", "xv", "vif"):
        return formats3.encode_viff(images[0])
    if fmt == "rla":
        return formats3.encode_rla(images[0])
    if fmt == "palm":
        return formats3.encode_palm(images[0])
    if fmt in ("pict", "pct"):
        return formats3.encode_pict(images[0])
    if fmt == "aai":
        return formats4.encode_aai(images[0])
    if fmt == "hrz":
        return formats4.encode_hrz(images[0])
    if fmt == "rgf":
        return formats4.encode_rgf(images[0])
    if fmt == "cip":
        return formats4.encode_cip(images[0])
    if fmt == "pgx":
        return formats4.encode_pgx(images[0], depth=16 if depth > 8 else 8)
    if fmt in ("vips", "v"):
        return formats4.encode_vips(images[0], depth=depth)
    if fmt == "inline":
        return formats4.encode_inline(images[0])
    if fmt in ("cals", "cal"):
        return formats4.encode_cals(images[0])
    if fmt == "art":
        return formats4.encode_art(images[0])
    if fmt == "xwd":
        return formats4.encode_xwd(images[0])
    if fmt in ("braille", "brf", "ubrl", "ubrl6", "isobrl", "isobrl6"):
        return formats4.encode_braille(
            images[0], "ubrl" if fmt == "braille" else fmt)
    if fmt == "uil":
        return formats4.encode_uil(images[0])
    if fmt in ("html", "htm", "shtml"):
        return formats4.encode_html(images[0])
    if fmt == "pdb":
        return formats4.encode_pdb(images[0])
    if fmt == "tim":
        return formats4.encode_tim(images[0])
    if fmt == "yuv":
        return formats4.encode_yuv(images[0])
    if fmt == "bayer":
        return formats4.encode_bayer(images[0], depth=depth)
    if fmt in ("ps", "ps2", "ps3"):
        # PostScript levels share the EPS writer (coders/ps2.c/ps3.c roles)
        return codecs.encode(images, "eps", quality=quality, depth=depth)
    if fmt in ("ept", "ept2", "ept3"):
        return formats4.encode_ept(images[0])
    if fmt == "ipl":
        return formats4.encode_ipl(images[0], depth=depth)
    if fmt == "map":
        return formats4.encode_map(images[0])
    if fmt == "ftxt":
        return formats4.encode_ftxt(images[0])
    if fmt == "ashlar":
        return formats4.encode_ashlar(images)
    if fmt in ("magick", "h"):
        return formats4.encode_magick(images[0])
    if fmt == "dcx":
        return formats4.encode_dcx(images)
    if fmt == "cur":
        return formats4.encode_cur(images[0])
    if fmt == "wpg":
        return formats4.encode_wpg(images[0])
    if fmt == "raw":
        return extra_coders.encode_raw(images[0], "gray", depth=depth)
    if fmt == "ora":
        return coders_r4.encode_ora(images)
    if fmt == "kernel":
        return coders_r4.encode_kernel(images[0])
    if fmt == "strimg":
        return coders_r4b.encode_strimg(images[0])
    if fmt == "debug":
        return coders_r4b.encode_debug(images)
    if fmt == "matte":
        return coders_r4b.encode_matte(images[0])
    if fmt in ("jbig", "jbg", "bie"):
        return coders_r4b.encode_jbig(images[0])
    if fmt in coders_r4b._META_PROFILE:
        return coders_r4b.encode_meta(images[0], fmt)
    if fmt in _VIDEO_FMTS:
        return coders_r4.encode_video(images, fmt)
    if fmt == "svg":
        # raster-in-SVG wrapper (the reference embeds the raster too
        # unless a tracing delegate like autotrace is installed)
        import base64 as _b64

        png = image_to_blob(images[0], "png")
        w0, h0 = images[0].width, images[0].height
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<svg xmlns="http://www.w3.org/2000/svg" '
            f'xmlns:xlink="http://www.w3.org/1999/xlink" '
            f'width="{w0}" height="{h0}">\n'
            f'<image width="{w0}" height="{h0}" '
            f'xlink:href="data:image/png;base64,'
            f'{_b64.b64encode(png).decode()}"/>\n</svg>\n').encode()
    return codecs.encode(images, fmt, quality=quality, depth=depth)


# native round-2 coders (io/formats2.py + formats3.py + formats4.py)
_FORMATS2_READ = {"dpx", "cin", "dcm", "dicom", "xcf", "fits", "fts",
                  "wbmp", "avs", "mtv", "fl32", "vicar", "vic", "otb",
                  "fax", "g3", "g4", "mat", "viff", "xv", "rla", "palm",
                  "pict", "pct",
                  "aai", "hrz", "scr", "rgf", "txt", "inline", "pgx",
                  "vips", "mono", "uyvy", "cals", "cal", "art", "sct",
                  "xwd", "sfw", "pdb", "tim", "cube", "pwp", "mvg", "ttf",
                  "otf", "cut", "rle", "mac", "pix", "yuv", "bayer",
                  "ept", "wpg", "ipl", "ftxt", "map", "magick", "tim2",
                  "uhdr", "jnx", "raw", "pes"}
_FORMATS2_WRITE = {"dpx", "psd", "pdf", "fits", "fts", "wbmp", "avs", "mtv",
                   "fl32", "vicar", "vic", "sun", "otb", "mono", "bgra",
                   "cmyk", "ycbcr", "uyvy", "fax", "g3", "g4", "mat",
                   "viff", "xv", "rla", "palm", "pict", "pct",
                   "aai", "hrz", "rgf", "cip", "pgx", "vips", "inline",
                   "cals", "cal", "art", "xwd", "braille", "brf", "ubrl",
                   "ubrl6", "isobrl", "isobrl6", "uil", "html", "htm",
                   "pdb", "tim", "yuv", "bayer", "ps", "ps2", "ps3",
                   "ept", "ipl", "ftxt", "map", "ashlar", "magick",
                   "dcx", "cur", "raw", "wpg"}
# PIL auto-detects these read-only formats from the blob (codecs.decode
# falls through to PIL.Image.open)
_PIL_READ_EXTRA = {"psd", "sun", "pcd", "dcx", "cur", "fli", "flc", "msp",
                   "pixar", "pxr", "spider", "wal", "gbr", "mpo", "blp",
                   "icns", "ftc", "ftu"}


def _heifjxl_formats():
    from .. import native

    out = set()
    if native.heif_available():
        out |= {"heic", "heif"}
    if native.jxl_available():
        out.add("jxl")
    if native.jbig_available():
        out |= {"jbig", "jbg", "bie"}
    return out


_VIDEO_FMTS = {"mp4", "mkv", "webm", "avi", "mov", "mpeg", "mpg", "wmv"}


def supported_read_formats():
    out = (set(_PSEUDO) | set(_NATIVE_EXT) | set(codecs._PIL_FORMATS)
           | _FORMATS2_READ | _PIL_READ_EXTRA
           | {"mpr", "dng", "ora", "mask", "clip", "dmr", "wmf", "emf"}
           | set(coders_r4b._META_PROFILE)
           | _heifjxl_formats())
    if delegates.has_ffmpeg():
        out |= _VIDEO_FMTS
    if delegates.has_graphviz():
        out |= {"dot", "gv"}
    if delegates.has_pcl():
        out.add("pcl")
    if delegates.has_xps():
        out.add("xps")
    if delegates.has_office():
        out |= {"doc", "docx", "odt", "pptx", "xlsx"}
    return sorted(out)


def supported_write_formats():
    out = (set(_NATIVE_EXT) | set(codecs._PIL_FORMATS)
           | _FORMATS2_WRITE
           | {"mpr", "null", "info", "json", "txt", "yaml", "dng",
              "ora", "kernel", "mask", "strimg", "debug", "matte", "dmr"}
           | set(coders_r4b._META_PROFILE)
           | _heifjxl_formats())
    if delegates.has_ffmpeg():
        out |= _VIDEO_FMTS
    return sorted(out)


def _decode_hdr(data: bytes) -> Image:
    """Radiance HDR via OpenCV (coders/hdr.c analog)."""
    import os as _os

    _os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2
    import numpy as _np

    arr = cv2.imdecode(_np.frombuffer(data, _np.uint8), cv2.IMREAD_UNCHANGED)
    if arr is None:
        raise ValueError("HDR decode failed")
    if arr.ndim == 3 and arr.shape[-1] >= 3:
        arr = arr[..., [2, 1, 0] + list(range(3, arr.shape[-1]))]  # BGR->RGB
    if arr.ndim == 2:
        arr = arr[..., None]
    from ..core.spec import ImageSpec as _Spec

    return Image(arr.astype("float32"), _Spec(colorspace="rgb", depth=16))


def _encode_hdr(image: Image) -> bytes:
    import cv2
    import numpy as _np

    arr = image.to_numpy().astype(_np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.shape[-1] == 1:
        arr = _np.repeat(arr, 3, -1)
    bgr = arr[..., [2, 1, 0]]
    ok, buf = cv2.imencode(".hdr", bgr)
    if not ok:
        raise ValueError("HDR encode failed")
    return buf.tobytes()
