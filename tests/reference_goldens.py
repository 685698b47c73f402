"""Extract and run the reference's docstring examples as a golden-value
oracle (third oracle beside the live PyTorch reference and scipy stand-ins).

The reference's Sphinx doctests embed expected outputs that were printed
from the released package with its *real* external kernels (torchcrepe,
torchlpc, torchaudio) installed — values this image cannot reproduce any
other way.  We parse each ``Examples`` block from
``/root/reference/diffsptk/modules/*.py`` (reference: Makefile:81-84 runs
them as `make test-example`), execute the code against *this* package via
a conversion shim, and compare the parsed expected values numerically.

Deterministic examples only: anything touching RNG or file IO is skipped.
The shim binds the name ``diffsptk`` lexically (sys.modules['diffsptk'] is
the real reference, owned by tests/oracle.py) and converts values at the
boundary: torch tensors flow in from example-constructed inputs, our jax
outputs flow back as torch tensors so chained example code (``y.abs()``,
``x.mT``, slicing) behaves as written.
"""

from __future__ import annotations

import inspect
import pathlib
import re

import jax.numpy as jnp
import numpy as np
import torch

import diffsptk_tpu

MODULE_DIR = pathlib.Path("/root/reference/diffsptk/modules")

# Examples whose outputs depend on RNG streams / voices that cannot match
# across frameworks, or on files; detected textually.
_NONDETERMINISTIC = re.compile(
    r"nrand|randn|\brand\b|manual_seed|read\(|\.wav|from_file")


# ----------------------------------------------------------------- parsing
def iter_examples(src: str):
    """Yield lists of (code_lines, expected_text) doctest items."""
    for blk in re.findall(r'Examples\s*\n\s*-+\s*\n(.*?)"""', src, re.S):
        lines = blk.splitlines()
        items, cur, exp = [], [], []
        for line in lines:
            s = line.strip()
            if s.startswith(">>>"):
                if cur and exp:
                    items.append((list(cur), "\n".join(exp)))
                if exp:
                    cur, exp = [], []
                cur.append(s[4:])
            elif s.startswith("..."):
                body = s[4:]
                cur.append(body if body.startswith(" ") else "    " + body)
            elif s:
                exp.append(s)
        if cur and exp:
            items.append((list(cur), "\n".join(exp)))
        if items:
            yield items


def parse_expected(text: str):
    """Parse an expected doctest output into a comparable value.

    Returns (kind, value): kind in {'tensor', 'shape', 'scalar'} or None
    if the text is not machine-comparable (elided reprs etc.)."""
    t = " ".join(text.split())
    m = re.match(r"tensor\((.*)\)$", t)
    if m:
        body = m.group(1)
        body = re.sub(r",\s*dtype=[\w.]+", "", body)
        body = re.sub(r",\s*grad_fn=<[^>]*>", "", body)
        body = re.sub(r",\s*device=[^,)]*", "", body)
        if "..." in body:
            return None
        try:
            return "tensor", np.array(
                eval(body, {"inf": np.inf, "nan": np.nan}))
        except Exception:
            return None
    m = re.match(r"torch\.Size\(\[(.*)\]\)$", t)
    if m:
        dims = tuple(int(v) for v in m.group(1).split(",") if v.strip())
        return "shape", dims
    try:
        return "scalar", float(t)
    except ValueError:
        return None


# -------------------------------------------------------------------- shim
def _to_ours(v):
    if isinstance(v, torch.Tensor):
        return jnp.asarray(v.detach().cpu().numpy())
    if isinstance(v, (list, tuple)):
        return type(v)(_to_ours(x) for x in v)
    return v


def _to_torch(v):
    if isinstance(v, jnp.ndarray):
        # copy: jax device buffers view as read-only numpy arrays
        return torch.from_numpy(np.array(v))
    if isinstance(v, np.ndarray):
        return torch.from_numpy(v.copy())
    if isinstance(v, (list, tuple)):
        return type(v)(_to_torch(x) for x in v)
    return v


class _BoundProxy:
    """Wraps a callable (op instance, method, function): converts torch
    inputs to jax on entry and jax outputs to torch on exit."""

    def __init__(self, fn):
        self._fn = fn

    def __call__(self, *args, **kwargs):
        args = tuple(_to_ours(a) for a in args)
        kwargs = {k: _to_ours(v) for k, v in kwargs.items()}
        return _to_torch(self._fn(*args, **kwargs))

    def __getattr__(self, name):
        return _wrap_value(getattr(self._fn, name))


def _wrap_value(obj):
    if isinstance(obj, (jnp.ndarray, np.ndarray)):
        return _to_torch(obj)
    if callable(obj) or hasattr(obj, "__call__"):
        return _BoundProxy(obj)
    return obj


class _ClassProxy:
    def __init__(self, cls):
        self._cls = cls

    def __call__(self, *args, **kwargs):
        args = tuple(_to_ours(a) for a in args)
        kwargs = {k: _to_ours(v) for k, v in kwargs.items()}
        return _BoundProxy(self._cls(*args, **kwargs))

    def __getattr__(self, name):
        return _wrap_value(getattr(self._cls, name))


class Shim:
    """Stands in for the name ``diffsptk`` inside example code."""

    def __getattr__(self, name):
        obj = getattr(diffsptk_tpu, name)
        if inspect.isclass(obj):
            return _ClassProxy(obj)
        if callable(obj):
            return _BoundProxy(obj)
        return obj


# ------------------------------------------------------------------ runner
_EXTRA_FILES = [
    pathlib.Path("/root/reference/diffsptk/signals.py"),
    pathlib.Path("/root/reference/diffsptk/utils/public.py"),
]


def collect_cases():
    """Yield (case_id, items) for every deterministic golden example."""
    paths = [p for p in sorted(MODULE_DIR.glob("*.py"))
             if p.name not in ("base.py", "__init__.py")] + _EXTRA_FILES
    for path in paths:
        src = path.read_text()
        for i, items in enumerate(iter_examples(src)):
            code = "\n".join(c for it in items for c in it[0])
            if _NONDETERMINISTIC.search(code):
                continue
            case_id = path.stem if i == 0 else f"{path.stem}#{i}"
            yield case_id, items


def run_case(items, rtol=2e-3, atol=6e-4):
    """Execute one example; compare every machine-comparable output.

    Returns the number of values compared (0 = nothing comparable)."""
    ns = {"diffsptk": Shim(), "torch": torch, "np": np}
    compared = 0
    for code_lines, expected in items:
        lines = [ln for ln in code_lines
                 if not re.match(r"import (diffsptk|torch)\b", ln)]
        if not lines:
            continue
        body = "\n".join(lines)
        try:
            val = eval(body, ns)
        except SyntaxError:
            if len(lines) > 1:
                exec("\n".join(lines[:-1]), ns)
            try:
                val = eval(lines[-1], ns)
            except SyntaxError:
                exec(lines[-1], ns)
                continue
        want = parse_expected(expected)
        if want is None:
            continue
        kind, ref = want
        got = np.asarray(val.detach() if isinstance(val, torch.Tensor)
                         else val)
        if kind == "shape":
            got_shape = (tuple(val) if isinstance(val, (tuple, list,
                                                        torch.Size))
                         else tuple(got.shape))
            assert got_shape == ref, (
                f"shape {got_shape} != expected {ref}")
        else:
            ref = np.asarray(ref)
            assert got.shape == ref.shape, (
                f"shape {got.shape} != expected {ref.shape}")
            np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol)
        compared += 1
    return compared
