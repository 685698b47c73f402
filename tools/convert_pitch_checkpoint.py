"""Convert released CREPE / FCNF0 checkpoints into diffsptk_tpu's npz
parameter format.

    python tools/convert_pitch_checkpoint.py crepe  /path/to/full.pth out.npz
    python tools/convert_pitch_checkpoint.py fcnf0  /path/to/fcnf0++.pt out.npz

* torchcrepe checkpoints (github.com/maxrmorrison/torchcrepe,
  torchcrepe/assets/{full,tiny}.pth) already use the parameter names this
  package expects (conv1.weight, conv1_BN.running_mean, classifier.bias,
  ...), so conversion is a dtype-preserving re-serialization with shape
  validation.
* penn checkpoints (github.com/interactiveaudiolab/penn) name layers by
  Sequential position; they are mapped positionally onto
  block{i}.{conv,norm} / head with shape validation — a mismatch aborts
  with both shapes printed.

Requires torch (CPU) to read the source checkpoint.
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def load_state(path):
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def convert_crepe(path, out, model="full"):
    from diffsptk_tpu.ops.pitch_nn import init_crepe_params
    expect = init_crepe_params(model)
    raw = load_state(path)
    params = {}
    for k, ref in expect.items():
        if k not in raw:
            raise SystemExit(f"missing key {k} in checkpoint "
                             f"(has {sorted(raw)[:8]}...)")
        v = raw[k]
        if tuple(v.shape) != tuple(ref.shape):
            raise SystemExit(f"shape mismatch {k}: checkpoint {v.shape} "
                             f"vs architecture {ref.shape}")
        params[k] = v
    np.savez(out, **params)
    print(f"wrote {out} ({len(params)} tensors)")


def convert_fcnf0(path, out):
    from diffsptk_tpu.ops.pitch_nn import init_fcnf0_params
    expect = init_fcnf0_params()
    raw = load_state(path)
    # positional mapping: consume tensors in order, matching by shape
    src = list(raw.items())
    params = {}
    for k, ref in expect.items():
        for i, (sk, sv) in enumerate(src):
            if tuple(sv.shape) == tuple(ref.shape):
                params[k] = sv
                del src[i]
                break
        else:
            raise SystemExit(
                f"no source tensor with shape {ref.shape} for {k}; "
                f"remaining source shapes: "
                f"{[(n, tuple(v.shape)) for n, v in src[:10]]}")
    np.savez(out, **params)
    print(f"wrote {out} ({len(params)} tensors); "
          f"{len(src)} source tensors unused")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    if kind == "crepe":
        convert_crepe(src, dst, *(sys.argv[4:5] or ["full"]))
    elif kind == "fcnf0":
        convert_fcnf0(src, dst)
    else:
        raise SystemExit(f"unknown checkpoint kind {kind}")
