"""Regenerate docs/API.md from the live package: python docs/gen_api.py"""
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
import diffsptk_tpu as d


def main():
    lines = ["# API reference", "",
             "Auto-generated from the package (`python docs/gen_api.py`).",
             "Every name below mirrors the reference diffsptk public surface;",
             "docstrings cite the corresponding reference file:line.", "",
             "## Operator classes", "",
             "| Class | Summary |", "|---|---|"]
    seen = set()
    for name in sorted(dir(d)):
        if name.startswith("_"):
            continue
        obj = getattr(d, name)
        if (inspect.isclass(obj) and obj not in seen
                and obj.__module__.startswith("diffsptk_tpu")):
            seen.add(obj)
            doc = (obj.__doc__ or "").strip().splitlines()
            s = (doc[0].strip() if doc else "").replace("|", "\\|")
            lines.append(f"| `{name}` | {s} |")

    lines += ["", "## Aliases", "", "| Alias | Target |", "|---|---|"]
    for name in sorted(dir(d)):
        if name.startswith("_"):
            continue
        obj = getattr(d, name)
        if (inspect.isclass(obj) and obj.__module__.startswith("diffsptk_tpu")
                and name != obj.__name__):
            lines.append(f"| `{name}` | `{obj.__name__}` |")

    lines += ["", "## Functional API (`diffsptk_tpu.functional`)", "",
              "| Function | Summary |", "|---|---|"]
    import diffsptk_tpu.functional as F
    for name in sorted(dir(F)):
        if name.startswith("_"):
            continue
        obj = getattr(F, name)
        if inspect.isfunction(obj):
            doc = (obj.__doc__ or "").strip().splitlines()
            s = (doc[0].strip() if doc else "").replace("|", "\\|")
            lines.append(f"| `{name}` | {s} |")

    lines += ["", "## Signal generators", "",
              "| Function | Summary |", "|---|---|"]
    import diffsptk_tpu.signals as S
    for name in ["impulse", "step", "ramp", "sin", "train", "mseq",
                 "nrand", "rand"]:
        obj = getattr(d, name, None) or getattr(S, name)
        doc = (obj.__doc__ or "").strip().splitlines()
        s = (doc[0].strip() if doc else "").replace("|", "\\|")
        lines.append(f"| `{name}` | {s} |")

    lines += ["", "## Parallel layer (`diffsptk_tpu.parallel`)", "",
              "| Name | Summary |", "|---|---|"]
    import diffsptk_tpu.parallel as Pp
    for name in sorted(dir(Pp)):
        if name.startswith("_"):
            continue
        obj = getattr(Pp, name)
        if ((inspect.isclass(obj) or inspect.isfunction(obj))
                and getattr(obj, "__module__", "").startswith("diffsptk_tpu")):
            doc = (obj.__doc__ or "").strip().splitlines()
            s = (doc[0].strip() if doc else "").replace("|", "\\|")
            lines.append(f"| `{name}` | {s} |")

    lines += ["", "## Kernels (`diffsptk_tpu.kernels`)", "",
              "| Name | Summary |", "|---|---|"]
    import diffsptk_tpu.kernels.recurrence as K
    for name in ["first_order_recurrence", "sample_wise_lpc",
                 "blocked_sample_wise_lpc", "chunked_sample_wise_lpc",
                 "lfilter"]:
        obj = getattr(K, name)
        doc = (obj.__doc__ or "").strip().splitlines()
        s = (doc[0].strip() if doc else "").replace("|", "\\|")
        lines.append(f"| `{name}` | {s} |")

    import os
    out = os.path.join(os.path.dirname(__file__), "API.md")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
