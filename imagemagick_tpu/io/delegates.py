"""External delegate bridge (delegate.c).

Re-implements the delegate system (/root/reference/MagickCore/delegate.c,
2,304 LoC; rules from config/delegates.xml.in): formats the framework
cannot decode natively are bridged through external programs — ghostscript
for PS/EPS/PDF (delegates.xml.in:75), ffmpeg for video.  Commands run with
%i/%o substitution into temp files, gated by the delegate policy domain.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List, Optional

from ..core.policy import policy


class DelegateError(Exception):
    pass


def _which(*names: str) -> Optional[str]:
    for n in names:
        p = shutil.which(n)
        if p:
            return p
    return None


def has_ghostscript() -> bool:
    return _which("gs", "gsc") is not None


def has_ffmpeg() -> bool:
    return _which("ffmpeg") is not None


def decode_postscript(data: bytes, fmt: str, density: int = 96) -> List:
    """PS/EPS/PDF via ghostscript -> PNG frames (delegates.xml.in gs rules)."""
    policy.enforce("delegate", "gs", "execute")
    gs = _which("gs", "gsc")
    if gs is None:
        raise DelegateError(
            f"no decode delegate for {fmt!r} (ghostscript not installed)")
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, f"in.{fmt}")
        with open(src, "wb") as f:
            f.write(data)
        out_pat = os.path.join(td, "page%03d.png")
        cmd = [gs, "-q", "-dQUIET", "-dSAFER", "-dBATCH", "-dNOPAUSE",
               "-sDEVICE=png16m", f"-r{density}",
               f"-sOutputFile={out_pat}", src]
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            raise DelegateError(f"ghostscript failed: {r.stderr[:200]!r}")
        from . import image_from_blob

        images = []
        for name in sorted(os.listdir(td)):
            if name.startswith("page"):
                with open(os.path.join(td, name), "rb") as f:
                    images.extend(image_from_blob(f.read(), "png"))
        if not images:
            raise DelegateError("ghostscript produced no pages")
        return images


def decode_video_frames(path: str, max_frames: int = 16, fps: float = 1.0) -> List:
    """Video via ffmpeg -> PNG frames (delegates.xml.in ffmpeg rules)."""
    policy.enforce("delegate", "ffmpeg", "execute")
    ff = _which("ffmpeg")
    if ff is None:
        raise DelegateError("no video delegate (ffmpeg not installed)")
    with tempfile.TemporaryDirectory() as td:
        out_pat = os.path.join(td, "f%04d.png")
        cmd = [ff, "-i", path, "-vf", f"fps={fps}", "-frames:v",
               str(max_frames), out_pat, "-y", "-loglevel", "error"]
        r = subprocess.run(cmd, capture_output=True, timeout=300)
        if r.returncode != 0:
            raise DelegateError(f"ffmpeg failed: {r.stderr[:200]!r}")
        from . import image_from_blob

        images = []
        for name in sorted(os.listdir(td)):
            with open(os.path.join(td, name), "rb") as f:
                images.extend(image_from_blob(f.read(), "png"))
        return images


def list_delegates() -> dict:
    """Delegate availability report (identify -list delegate analog)."""
    return {
        "gs (ps/eps/pdf)": has_ghostscript(),
        "ffmpeg (video)": has_ffmpeg(),
    }
