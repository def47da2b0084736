"""Multicall tool implementations: mogrify, composite, montage, conjure.

Mirrors the reference's legacy tool set (/root/reference/MagickWand/
mogrify.c:9,098 LoC, composite.c:1,699, montage.c:1,862, conjure.c:309)
each as a thin front-end over the shared option interpreter in main.py.
conjure executes MSL (XML pipeline) scripts — /root/reference/coders/msl.c.
"""

from __future__ import annotations

import glob
import os
import sys
import time
from typing import List, Optional, Sequence

from .main import CLIError, CLIState, LazyImage, process, _write_output


def mogrify_main(argv: Sequence[str]) -> int:
    """mogrify: apply ops to each file in place (MogrifyImageCommand)."""
    opts: List[str] = []
    paths: List[str] = []
    out_format = None
    out_path = None
    i = 0
    argv = list(argv)
    while i < len(argv):
        a = argv[i]
        if a == "-format":
            out_format = argv[i + 1]
            i += 2
        elif a == "-path":
            out_path = argv[i + 1]
            i += 2
        elif a.startswith(("-", "+")):
            opts.append(a)
            # consume args for known multi-arg options heuristically
            from .main import OPS, _SETTINGS, _build_ops
            global_ops = _build_ops()
            name = a[1:]
            n = 0
            if name in global_ops:
                n = global_ops[name][0]
            elif name in _SETTINGS or name in ("size", "depth", "define",
                                               "limit", "label", "comment"):
                n = 2 if name == "limit" else 1
            for _ in range(n):
                i += 1
                opts.append(argv[i])
            i += 1
        else:
            paths.append(a)
            i += 1
    rc = 0
    for p in paths:
        try:
            if out_format:
                dst = os.path.splitext(p)[0] + "." + out_format.lower()
            else:
                dst = p
            if out_path:
                dst = os.path.join(out_path, os.path.basename(dst))
            process([p] + opts + [dst])
        except (CLIError, FileNotFoundError, ValueError) as e:
            print(f"mogrify: {e}", file=sys.stderr)
            rc = 1
    return rc


def composite_main(argv: Sequence[str]) -> int:
    """composite: overlay source over dest (CompositeImageCommand).

    Usage: composite [opts] source [mask] dest output
    """
    opts: List[str] = []
    paths: List[str] = []
    compose = "over"
    gravity = None
    geometry = None
    argv = list(argv)
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-compose":
            compose = argv[i + 1]; i += 2
        elif a == "-gravity":
            gravity = argv[i + 1]; i += 2
        elif a == "-geometry":
            geometry = argv[i + 1]; i += 2
        elif a == "-dissolve":
            compose = "dissolve"
            opts += ["-define", f"dissolve={argv[i + 1]}"]; i += 2
        elif a == "-stereo":
            # composite.c:183: StereoAnaglyphImage(base, overlay, x, y)
            compose = None
            opts += ["-stereo", argv[i + 1]]; i += 2
        elif a.startswith("-"):
            opts.append(a)
            i += 1
        else:
            paths.append(a)
            i += 1
    if len(paths) < 3:
        print("composite: usage: composite src dst out", file=sys.stderr)
        return 2
    src, dst, out = paths[0], paths[-2], paths[-1]
    args = [dst, src, *opts]
    if compose is not None:   # None: a list-op in opts (e.g. -stereo)
        args += ["-compose", compose]
    if gravity:
        args += ["-gravity", gravity]
    if geometry:
        args += ["-geometry", geometry]
    if compose is not None:
        args += ["-composite"]
    args += [out]
    try:
        process(args)
        return 0
    except (CLIError, FileNotFoundError, ValueError) as e:
        print(f"composite: {e}", file=sys.stderr)
        return 1


def montage_main(argv: Sequence[str]) -> int:
    """montage tool (MontageImageCommand)."""
    args = []
    tile = None
    geometry = "120x120+4+3"
    argv = list(argv)
    i = 0
    inputs = []
    while i < len(argv):
        a = argv[i]
        if a == "-tile":
            tile = argv[i + 1]; i += 2
        elif a == "-geometry":
            geometry = argv[i + 1]; i += 2
        elif a.startswith(("-", "+")):
            args.append(a)
            i += 1
        else:
            inputs.append(a)
            i += 1
    if len(inputs) < 2:
        print("montage: need inputs and an output", file=sys.stderr)
        return 2
    out = inputs[-1]
    try:
        st = CLIState()
        if tile:
            st.settings["tile"] = tile
        st.settings["compose-geometry"] = geometry
        st = process(inputs[:-1] + ["-montage", out], st)
        return 0
    except (CLIError, FileNotFoundError, ValueError) as e:
        print(f"montage: {e}", file=sys.stderr)
        return 1


def conjure_main(argv: Sequence[str]) -> int:
    """conjure: execute MSL scripts (coders/msl.c XML pipelines)."""
    rc = 0
    for path in argv:
        if path.startswith("-"):
            continue
        try:
            with open(path) as f:
                run_msl(f.read())
        except Exception as e:
            print(f"conjure: {e}", file=sys.stderr)
            rc = 1
    return rc


def run_msl(xml_text: str) -> None:
    """Interpret an MSL document: <image>, <read>, <write>, op elements."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)

    def handle_group(el):
        st = CLIState()
        for child in el:
            tag = child.tag.lower()
            a = child.attrib
            if tag == "image":
                if "size" in a:
                    st.size = a["size"]
                handle_children(child, st)
            else:
                handle_element(child, st)
        return st

    def handle_children(el, st):
        for child in el:
            handle_element(child, st)

    def handle_element(el, st):
        tag = el.tag.lower()
        a = el.attrib
        if tag == "read":
            from .. import io as iio

            for im in iio.read_images(a["filename"], size=st.size):
                st.images.append(LazyImage(im))
        elif tag == "write":
            _write_output(st, a["filename"])
        elif tag == "resize":
            process_fragment(st, ["-resize", a.get("geometry", "100%")])
        elif tag == "blur":
            g = a.get("geometry") or f"{a.get('radius', 0)}x{a.get('sigma', 1)}"
            process_fragment(st, ["-blur", g])
        elif tag == "gaussian-blur" or tag == "gaussianblur":
            g = a.get("geometry") or f"{a.get('radius', 0)}x{a.get('sigma', 1)}"
            process_fragment(st, ["-gaussian-blur", g])
        elif tag == "crop":
            process_fragment(st, ["-crop", a.get("geometry", "100%")])
        elif tag in ("negate", "flip", "flop", "equalize", "normalize",
                     "despeckle", "trim", "magnify"):
            process_fragment(st, [f"-{tag}"])
        elif tag == "colorspace":
            process_fragment(st, ["-colorspace", a.get("colorspace", "sRGB")])
        elif tag == "rotate":
            process_fragment(st, ["-rotate", a.get("degrees", "0")])
        elif tag == "set":
            for k, v in a.items():
                for li in st.images:
                    li.image.properties[k] = v
        elif tag == "get":
            pass
        else:
            # generic: map tag to -tag with geometry/first attribute
            arg = a.get("geometry") or next(iter(a.values()), None)
            frag = [f"-{tag}"] + ([arg] if arg else [])
            try:
                process_fragment(st, frag)
            except CLIError:
                pass

    def process_fragment(st, frag):
        process(frag, st)

    if root.tag.lower() in ("image", "msl", "group"):
        if root.tag.lower() == "image":
            st = CLIState()
            if "size" in root.attrib:
                st.size = root.attrib["size"]
            handle_children(root, st)
        else:
            for child in root:
                if child.tag.lower() == "image":
                    st = CLIState()
                    if "size" in child.attrib:
                        st.size = child.attrib["size"]
                    handle_children(child, st)
                else:
                    handle_group(root)
                    break


def bench_run(argv: Sequence[str], iterations: int, concurrent: bool = False) -> int:
    """-bench N: repeat the whole command, print Performance line
    (MagickCommandGenesis, magick-cli.c:116-300)."""
    t0 = time.perf_counter()
    rc = 0
    for _ in range(iterations):
        rc = _run_once(argv)
    dt = time.perf_counter() - t0
    ips = iterations / dt if dt > 0 else 0.0
    user = dt  # single-process proxy
    mins, secs = divmod(dt, 60.0)
    print(f"Performance[1]: {iterations}i {ips:.3f}ips 1.000e {user:.3f}u "
          f"{int(mins)}:{secs:06.3f}", file=sys.stderr)
    return rc


def _run_once(argv) -> int:
    try:
        process(list(argv))
        return 0
    except (CLIError, FileNotFoundError, ValueError) as e:
        print(f"tmagick: {e}", file=sys.stderr)
        return 1


def display_main(argv: Sequence[str], animate: bool = False) -> int:
    """display/animate without X11: in-terminal sixel rendering.

    The reference's display.c/animate.c drive an X server; here the
    terminal IS the display — frames render as sixel escape sequences
    (supported by xterm -ti vt340, mlterm, foot, wezterm, iTerm2...).
    Enabled when stdout is a TTY or IMTPU_SIXEL=1; otherwise falls back
    to writing a file and reporting its path (headless environments).
    """
    st = process(list(argv))
    if not st.images:
        print(f"{'animate' if animate else 'display'}: no images",
              file=sys.stderr)
        return 1
    images = [li.materialize() for li in st.images]
    use_sixel = os.environ.get("IMTPU_SIXEL") == "1" or sys.stdout.isatty()
    if not use_sixel:
        out = ("/tmp/tmagick-animate.gif" if animate and len(images) > 1
               else "/tmp/tmagick-display.png")
        from .. import io as iio

        iio.write_image(images if len(images) > 1 else images[0], out)
        print(f"{'animate' if animate else 'display'}: no sixel terminal; "
              f"wrote {out}", file=sys.stderr)
        return 0

    from ..io.extra_coders import encode_sixel
    from ..ops import resize as rz

    max_w = int(os.environ.get("IMTPU_DISPLAY_WIDTH", "800"))
    frames = images if animate else images[:1]
    for img in frames:
        if img.width > max_w:
            h = max(1, round(img.height * max_w / img.width))
            img = img.replace(data=rz.resize(img.data, h, max_w, "triangle"))
        sys.stdout.buffer.write(encode_sixel(img))
        sys.stdout.buffer.write(b"\n")
        sys.stdout.buffer.flush()
        if animate and len(frames) > 1:
            time.sleep(max(img.delay, 2) / 100.0)
    return 0
