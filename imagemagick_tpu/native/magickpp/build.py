"""Build helper for the Magick++ compatibility library.

Produces libmagickpp_tpu.so (the embedded-interpreter binding) next to the
sources.  C++ programs compile with::

    g++ prog.cpp -I<this dir> -L<this dir> -lmagickpp_tpu \
        $(python3-config --embed --ldflags) -o prog

and must run with PYTHONPATH including the repo root so the embedded
interpreter can import imagemagick_tpu.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
import threading
from typing import List, Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "magickpp.cpp")
_SO = os.path.join(_HERE, "libmagickpp_tpu.so")
_lock = threading.Lock()


def _py_link_flags() -> List[str]:
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION")
    flags = []
    if libdir:
        flags += [f"-L{libdir}", f"-Wl,-rpath,{libdir}"]
    flags += [f"-lpython{ver}", "-ldl", "-lm"]
    return flags


def include_dir() -> str:
    return _HERE


def build(force: bool = False) -> Optional[str]:
    """Compile libmagickpp_tpu.so; returns its path or raises on error."""
    with _lock:
        hdrs = [os.path.join(_HERE, "Magick++.h"),
                os.path.join(_HERE, "Drawable.h")]
        if (not force and os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
                and all(os.path.getmtime(_SO) >= os.path.getmtime(h)
                        for h in hdrs)):
            return _SO
        inc = sysconfig.get_path("include")
        cmd = (["g++", "-O1", "-fPIC", "-shared", "-std=c++11", _SRC,
                f"-I{inc}", f"-I{_HERE}"] + _py_link_flags()
               + ["-o", _SO])
        r = subprocess.run(cmd, capture_output=True, timeout=300)
        if r.returncode != 0:
            raise RuntimeError(
                "magickpp build failed:\n" + r.stderr.decode(errors="replace"))
        return _SO


def compile_program(source_path: str, out_path: str) -> str:
    """Compile a user C++ program against the Magick++ layer."""
    build()
    inc = sysconfig.get_path("include")
    cmd = (["g++", "-O0", "-std=c++11", source_path, f"-I{_HERE}",
            f"-I{inc}", f"-L{_HERE}", "-lmagickpp_tpu",
            f"-Wl,-rpath,{_HERE}"] + _py_link_flags() + ["-o", out_path])
    r = subprocess.run(cmd, capture_output=True, timeout=300)
    if r.returncode != 0:
        raise RuntimeError(
            "program build failed:\n" + r.stderr.decode(errors="replace"))
    return out_path
