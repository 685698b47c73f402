"""Core module protocol for the TPU-native differentiable-SPTK framework.

Design stance (see SURVEY.md §7): every operator is split into

* ``_check(...)``    -- host-side parameter validation (raises ``ValueError``);
* ``_design(...)``   -- host-side construction of all derived state, returning a
  :class:`Design` of scalar ``values``, child ``layers`` and numpy ``arrays``
  (basis matrices, windows, filter prototypes).  Design math runs in numpy
  float64 regardless of the compute dtype, so design-time precision never
  limits on-device float32 compute (TPU f64 is emulated and slow);
* ``_forward(x, **state)`` -- the pure, jittable JAX computation.

This replaces the reference's ``nn.Module``/``Precomputed`` machinery
(reference: diffsptk/modules/base.py:26-101) with a functional equivalent:
an instance is just frozen config + a dict of device arrays (``self.params``),
and ``Op.apply(params, x)`` is a pure function of the params pytree, so
``jax.grad``/``optax`` train learnable bases with no further plumbing.
The class/functional duality of the reference collapses: the stateless path
(`*_func*`) designs into an LRU cache and calls the same ``_forward``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def full_precision(fn):
    """Pin matmul precision to full float32 inside library entry points.

    On TPU, JAX's DEFAULT matmul precision rounds inputs to bfloat16.
    This library's operators assemble solver systems and basis transforms
    by matmul (Newton Hessians, freqt warps, DFT plans); 1e-3-relative
    rounding there silently breaks f32 parity — and makes the mgcep
    Newton Hessian lose positive-definiteness outright (NaN).  Rather
    than mutate the process-global config at import time (which would
    silently slow every matmul in unrelated user code sharing the
    process), the library scopes the override to its own dispatch points:
    ``BaseOp.apply``, the stateless ``_apply_design`` path, and learner
    entry points.  Hot paths with an accuracy budget opt into lower
    precision via explicit ``precision=`` arguments (which always win
    over this default, e.g. kernels/mlsa_cascade.py).  Under ``jit`` the
    context applies at trace time, so there is no runtime cost.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


class Design(NamedTuple):
    """Host-side precomputed state for one operator.

    values:  static Python scalars / strings consumed as jit-static config.
    layers:  child operators (callables).
    arrays:  numerical constants that live on device; these are the
             (potentially learnable) parameters of the op.
    """

    values: dict[str, Any] = {}
    layers: dict[str, Callable] = {}
    arrays: dict[str, Any] = {}


def default_dtype() -> jnp.dtype:
    """The framework-wide real compute dtype.

    float32 unless the user enabled x64 (tests run with x64 to hit the
    reference's float64 parity tolerances).
    """
    return jnp.asarray(0.0).dtype


def default_complex_dtype() -> jnp.dtype:
    return jnp.result_type(default_dtype(), np.complex64)


def to_device_array(a, dtype=None):
    """Convert a design-time numpy array to a device array.

    Complex design arrays map to the complex counterpart of the requested
    real dtype — and stay on the HOST as numpy: they trace into jit
    graphs as constants with no device round-trip, which matters on
    remote-tunnel TPU backends where complex device->host transfers are
    unimplemented (eager jnp ops convert them on the fly).
    """
    a = np.asarray(a)
    if dtype is None:
        dtype = default_dtype()
    if np.iscomplexobj(a):
        cdtype = jnp.result_type(jnp.dtype(dtype), np.complex64)
        return np.asarray(a, dtype=cdtype)
    if np.issubdtype(a.dtype, np.integer) or a.dtype == np.bool_:
        # index/mask constants must keep their integral dtype
        return jnp.asarray(a)
    return jnp.asarray(a, dtype=dtype)


def filter_values(d: dict, drop_keys: tuple = ()) -> dict:
    """Forward constructor locals to ``_design`` without re-listing them."""
    out = {}
    for k, v in d.items():
        if k in ("self", "__class__") or k in drop_keys:
            continue
        out[k] = v
    return out


def check_size(actual: int, expected: int, name: str) -> None:
    if actual != expected:
        raise ValueError(f"Unexpected {name} (input {actual} vs expected {expected}).")


class BaseOp:
    """Base class for functional operators.

    Subclasses implement the static methods ``_check``, ``_design`` and
    ``_forward``.  The constructor stores values/layers as attributes and
    device arrays in ``self.params``.

    Learnable ops: pass ``learnable=True`` (or a list of array names) to the
    constructor; ``self.learnable`` records which entries of ``self.params``
    are trainable.  Training uses the pure form::

        loss = lambda p, x: f(op.apply(p, x))
        grads = jax.grad(loss)(op.params, x)
    """

    def __init__(self, *args, **kwargs):  # pragma: no cover - overridden
        raise NotImplementedError

    def __init_subclass__(cls, **kwargs):
        # Ops that override __call__ (WORLD chain, CQT, learlikes)
        # bypass apply(); pin their matmul precision at the override
        # itself so every library entry point gets the same full-f32
        # default (see full_precision).
        super().__init_subclass__(**kwargs)
        if "__call__" in cls.__dict__:
            cls.__call__ = full_precision(cls.__dict__["__call__"])

    # -- construction ----------------------------------------------------
    def _setup(self, design: Design, learnable: bool | list[str] = False,
               dtype=None) -> None:
        self._value_names = tuple(design.values)
        for name, value in design.values.items():
            setattr(self, name, value)
        self._layer_names = tuple(design.layers)
        for name, layer in design.layers.items():
            setattr(self, name, layer)
        self.params: dict[str, jnp.ndarray] = {
            name: (a if isinstance(a, jnp.ndarray) else to_device_array(a, dtype))
            for name, a in design.arrays.items()
        }
        if learnable is True:
            self.learnable = tuple(design.arrays)
        elif learnable is False:
            self.learnable = ()
        else:
            self.learnable = tuple(learnable)

    # -- execution -------------------------------------------------------
    def __call__(self, *args, **kwargs):
        return self.apply(self.params, *args, **kwargs)

    @full_precision
    def apply(self, params: dict, *args, **kwargs):
        """Pure application: ``params`` replaces ``self.params``."""
        state = {name: getattr(self, name) for name in self._value_names}
        state.update({name: getattr(self, name) for name in self._layer_names})
        state.update(params)
        return self._forward(*args, **kwargs, **state)

    @property
    def trainable_params(self) -> dict:
        return {k: v for k, v in self.params.items() if k in self.learnable}

    # -- functional path ---------------------------------------------------
    # Names of positional inputs to _forward (override for multi-input ops).
    _input_names: tuple[str, ...] = ("x",)

    @classmethod
    @full_precision
    def _apply_design(cls, design: Design, **inputs):
        state = {**design.values, **design.layers}
        state.update({k: to_device_array(v) for k, v in design.arrays.items()})
        return cls._forward(**inputs, **state)

    @classmethod
    def _func(cls, *inputs, **kwargs):
        """Stateless path: design fresh (cached) and forward."""
        design = cls._design(**kwargs)
        if len(inputs) > len(cls._input_names):
            raise TypeError(
                f"{cls.__name__}._func takes at most "
                f"{len(cls._input_names)} inputs {cls._input_names}, "
                f"got {len(inputs)}")
        bound = dict(zip(cls._input_names, inputs))
        return cls._apply_design(design, **bound)

    # -- protocol ----------------------------------------------------------
    @staticmethod
    def _check(*args, **kwargs) -> None:
        raise NotImplementedError

    @staticmethod
    def _design(*args, **kwargs) -> Design:
        raise NotImplementedError

    @staticmethod
    def _forward(*args, **kwargs):
        raise NotImplementedError


class BaseNonFunctionalOp(BaseOp):
    """Marker: op with no stateless functional wrapper (matches reference
    BaseNonFunctionalModule, diffsptk/modules/base.py:34)."""


class BaseLearnerOp:
    """Base for data-driven learners (GMM/LBG/PCA/ICA/NMF); they expose
    ``fit``/``transform`` instead of the design/forward protocol
    (reference: diffsptk/modules/base.py:104-109)."""

    def __init_subclass__(cls, **kwargs):
        # Same full-f32 pinning as BaseOp, at the learner entry points.
        super().__init_subclass__(**kwargs)
        for name in ("__call__", "transform"):
            if name in cls.__dict__:
                setattr(cls, name, full_precision(cls.__dict__[name]))

    def transform(self, *args, **kwargs):
        raise NotImplementedError


def design_cache(fn):
    """LRU cache for the stateless functional path's design step.

    Keys must be hashable; numpy outputs are cached on host and converted
    per call (conversion is constant-folded under jit).
    """

    @functools.lru_cache(maxsize=512)
    def cached(*args, **kwargs):
        return fn(*args, **kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return cached(*args, **kwargs)
        except TypeError:  # unhashable arg; design fresh
            return fn(*args, **kwargs)

    return wrapper


def get_layer(module: bool, cls, params: dict):
    """Return a child op instance (module path) or a closure over the
    stateless design+forward (functional path).

    Mirrors the reference's get_layer (diffsptk/utils/private.py:45-60): one
    implementation serves both the stateful and the functional API.
    """
    if module:
        return cls(**params)

    def layer(*args):
        return cls._func(*args, **params)

    layer._cls = cls
    layer._params = params
    return layer
