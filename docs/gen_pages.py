"""Generate per-operator documentation pages: python docs/gen_pages.py

Writes docs/ops/<name>.md for every public operator class (mirroring the
reference's per-module Sphinx pages, /root/reference/docs/source/modules/)
plus docs/ops/index.md.  Content is pulled from the live package:
docstrings (with runnable examples), constructor signatures, aliases, and
the stateless functional counterpart.
"""

from __future__ import annotations

import inspect
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import diffsptk_tpu as d
import diffsptk_tpu.functional as F

OUT = os.path.join(os.path.dirname(__file__), "ops")


def collect():
    """class object -> sorted list of exported names (canonical first)."""
    names = {}
    for name in sorted(dir(d)):
        if name.startswith("_"):
            continue
        obj = getattr(d, name)
        if inspect.isclass(obj) and obj.__module__.startswith("diffsptk_tpu"):
            names.setdefault(obj, []).append(name)
    out = {}
    for obj, aliases in names.items():
        canon = obj.__name__ if obj.__name__ in aliases else aliases[0]
        rest = sorted(a for a in aliases if a != canon)
        out[obj] = [canon] + rest
    return out


def functional_map():
    """class -> (functional name, function object)."""
    src = inspect.getsource(F)
    out = {}
    for m in re.finditer(r"def (\w+)\(.*?\n(.*?)(?=\n\ndef |\Z)", src,
                         re.S):
        fname, body = m.group(1), m.group(2)
        for cls_name in re.findall(r"(\w+)\._func", body):
            obj = getattr(d, cls_name, None)
            if obj is not None and fname not in ("iwht",):
                out.setdefault(obj, (fname, getattr(F, fname)))
    return out


def page(obj, aliases, func):
    canon = aliases[0]
    lines = [f"# {canon}", ""]
    if len(aliases) > 1:
        lines += ["Aliases: " + ", ".join(f"`{a}`" for a in aliases[1:]), ""]
    lines += [f"Module: `{obj.__module__}`", ""]
    doc = inspect.cleandoc(obj.__doc__ or "")
    if doc:
        # fence the Examples block as a doctest code block
        parts = doc.split("Examples\n--------")
        lines += [parts[0].rstrip(), ""]
        if len(parts) > 1:
            lines += ["## Examples", "", "```python"]
            lines += [parts[1].strip(), "```", ""]
    try:
        sig = str(inspect.signature(obj.__init__))
        sig = sig.replace("(self, ", "(").replace("(self)", "()")
        lines += ["## Constructor", "", "```python",
                  f"{canon}{sig}", "```", ""]
    except (TypeError, ValueError):
        pass
    if func is not None:
        fname, fobj = func
        fdoc = inspect.cleandoc(fobj.__doc__ or "").strip()
        try:
            fsig = str(inspect.signature(fobj))
        except (TypeError, ValueError):
            fsig = "(...)"
        lines += ["## Functional form", "", "```python",
                  f"diffsptk_tpu.functional.{fname}{fsig}", "```", ""]
        if fdoc:
            lines += [fdoc, ""]
    return "\n".join(lines).rstrip() + "\n"


def main():
    classes = collect()
    funcs = functional_map()
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    index = ["# Operator reference", "",
             "One page per operator, generated from the live package",
             "(`python docs/gen_pages.py`).  Examples are runnable doctests",
             "(validated by `tests/test_doctests.py`).", ""]
    skip_prefixes = ("Base", "Design")
    rows = []
    for obj, aliases in sorted(classes.items(), key=lambda kv: kv[1][0]):
        canon = aliases[0]
        if canon.startswith(skip_prefixes):
            continue
        func = funcs.get(obj)
        fname = canon.lower() if func is None else func[0]
        path = os.path.join(OUT, f"{fname}.md")
        # collision (e.g. two classes map to one functional family page):
        # fall back to the class name
        if os.path.exists(path):
            path = os.path.join(OUT, f"{canon}.md")
        open(path, "w").write(page(obj, aliases, func))
        doc0 = (inspect.cleandoc(obj.__doc__ or "").splitlines() or [""])[0]
        rows.append((os.path.basename(path), canon, doc0))
    index += ["| Page | Operator | Summary |", "|---|---|---|"]
    for fn, canon, s in sorted(rows):
        index.append(f"| [{fn}]({fn}) | `{canon}` | {s.replace('|', '-')} |")
    open(os.path.join(OUT, "index.md"), "w").write("\n".join(index) + "\n")
    print(f"wrote {len(rows)} pages + index to {OUT}")


if __name__ == "__main__":
    main()
