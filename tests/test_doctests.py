"""Doctest runner: every runnable example in the package's docstrings
executes green (the reference runs `make test-example` over its module
doctests, /root/reference/Makefile:81-84).  Runs in the test context
(CPU, x64) set by conftest.py."""

from __future__ import annotations

import doctest
import importlib
import pkgutil

import pytest

import diffsptk_tpu


def _modules():
    names = ["diffsptk_tpu", "diffsptk_tpu.signals",
             "diffsptk_tpu.functional"]
    for pkg in ("ops", "kernels", "utils", "models", "parallel"):
        mod = importlib.import_module(f"diffsptk_tpu.{pkg}")
        for info in pkgutil.iter_modules(mod.__path__):
            names.append(f"diffsptk_tpu.{pkg}.{info.name}")
    return names


@pytest.mark.parametrize("name", _modules())
def test_module_doctests(name):
    mod = importlib.import_module(name)
    result = doctest.testmod(
        mod, optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
        verbose=False)
    assert result.failed == 0, f"{result.failed} doctest failures in {name}"


def test_doctest_coverage_floor():
    """At least the core op modules must carry runnable examples."""
    total = 0
    for name in _modules():
        mod = importlib.import_module(name)
        finder = doctest.DocTestFinder()
        total += sum(len(t.examples) for t in finder.find(mod))
    assert total >= 60, f"only {total} doctest examples in the package"
