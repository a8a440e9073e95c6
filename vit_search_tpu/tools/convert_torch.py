"""Convert reference PyTorch checkpoints to this framework's parameter trees.

Lets users of the reference implementation bring their trained weights
(`checkpoint.pth.tar` with ``model`` / ``model_ema`` state dicts,
reference main.py:505-523) to the TPU framework:

    python -m vit_search_tpu.tools.convert_torch \
        --torch-ckpt checkpoint.pth.tar \
        --model flexible_vit_sr_patch14_224_patch_output \
        --network-def '...' --out converted/

Name/layout mapping (torch -> flax):
  patch_embed.proj.weight  (O,I,kh,kw) -> patch_embed/proj kernel; the linear
      stem stores (kh*kw*I, O) matching PatchEmbed's reshape-matmul layout
  blocks.<j>.*             -> blocks_<j+1>/* (slots are network_def indices;
      slot 0 is the stem)
  attention/MLP/LN linears: torch (out, in) -> flax kernel (in, out)
  convs: torch (O, I, kh, kw) -> flax (kh, kw, I, O)
  BatchNorm: weight/bias -> scale/bias, running stats -> batch_stats
  SR blocks: patch_reduce -> reduce, token_transform, pos_embed as-is
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def _linear(sd: Dict, name: str) -> Dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd: Dict, name: str) -> Dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _conv(sd: Dict, name: str) -> Dict:
    out = {"kernel": np.ascontiguousarray(
        sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _bn(sd: Dict, name: str) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def convert_state_dict(sd: Dict[str, np.ndarray], network_def) -> Tuple[Dict, Dict]:
    """Reference ViT-SR state dict -> (params, batch_stats) trees."""
    from ..arch import network_def as nd

    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    batch_stats: Dict = {}

    # stem
    stem_type = nd.block_type(network_def[0])
    if stem_type == nd.LINEAR_EMBED:
        w = sd["patch_embed.proj.weight"]          # (O, I, p, p)
        o, i, ph, pw = w.shape
        # PatchEmbed flattens (p, p, I) patches; torch conv weight is (O,I,p,p)
        kernel = w.transpose(2, 3, 1, 0).reshape(ph * pw * i, o)
        params["patch_embed"] = {"proj": {
            "kernel": np.ascontiguousarray(kernel),
            "bias": sd["patch_embed.proj.bias"]}}
    else:
        pe: Dict = {"proj": _conv(sd, "patch_embed.conv_proj")}
        pe_stats: Dict = {}
        for mine, theirs in (("conv1", "conv1"), ("conv2", "conv2"),
                             ("conv3", "conv3")):
            pe[mine] = {"conv": _conv(sd, f"patch_embed.{theirs}.conv")}
            bn_params, bn_stats = _bn(sd, f"patch_embed.{theirs}.bn")
            pe[mine]["bn"] = bn_params
            pe_stats[mine] = {"bn": bn_stats}
        params["patch_embed"] = pe
        batch_stats["patch_embed"] = pe_stats

    if "tokens" in sd:
        params["tokens"] = sd["tokens"]
    if "pos_embed" in sd:
        params["pos_embed"] = sd["pos_embed"]
    if "norm.weight" in sd:
        params["norm"] = _norm(sd, "norm")
    for head in ("cls_head", "dst_head", "patch_head"):
        if f"{head}.weight" in sd:
            params[head] = _linear(sd, head)

    # reference blocks.<j> maps to network_def slot j+1
    j = 0
    for slot, block in enumerate(network_def):
        btype = nd.block_type(block)
        if btype == nd.TRANSFORMER:
            if block[3]:
                prefix = f"blocks.{j}"
                params[f"blocks_{slot}"] = {
                    "norm1": _norm(sd, f"{prefix}.norm1"),
                    "norm2": _norm(sd, f"{prefix}.norm2"),
                    "attn": {"qkv": _linear(sd, f"{prefix}.attn.qkv"),
                             "proj": _linear(sd, f"{prefix}.attn.proj")},
                    "mlp": {"fc1": _linear(sd, f"{prefix}.mlp.fc1"),
                            "fc2": _linear(sd, f"{prefix}.mlp.fc2")},
                }
            j += 1
        elif btype == nd.SPATIAL_REDUCTION:
            prefix = f"blocks.{j}"
            params[f"blocks_{slot}"] = {
                "norm": _norm(sd, f"{prefix}.norm"),
                "reduce": _conv(sd, f"{prefix}.patch_reduce"),
                "token_transform": _linear(sd, f"{prefix}.token_transform"),
                "pos_embed": sd[f"{prefix}.pos_embed"],
            }
            j += 1
    return params, batch_stats


def load_torch_checkpoint(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read a reference ``.pth(.tar)`` checkpoint to numpy state dicts."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for key in ("model", "model_ema"):
        if isinstance(blob, dict) and key in blob:
            out[key] = {k.replace("module.", ""): v.numpy()
                        for k, v in blob[key].items()}
    if not out:  # bare state dict
        out["model"] = {k.replace("module.", ""): v.numpy()
                        for k, v in blob.items()}
    elif "epoch" in blob:
        # training checkpoints carry the epoch (reference main.py:409-411);
        # resume uses it to continue the LR schedule at epoch+1
        out["epoch"] = int(blob["epoch"])
    return out


def main(argv=None) -> int:
    import jax

    from ..arch import parse_network_def
    from ..models import create_model
    from ..train.checkpoint import CheckpointManager
    from ..train.optim import OptimConfig, make_optimizer
    from ..train.state import TrainState

    parser = argparse.ArgumentParser("convert reference torch checkpoint")
    parser.add_argument("--torch-ckpt", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--network-def", required=True)
    parser.add_argument("--input-size", default=224, type=int)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    network_def = parse_network_def(args.network_def)
    model = create_model(args.model, network_def=network_def,
                         img_size=args.input_size)
    state_dicts = load_torch_checkpoint(args.torch_ckpt)
    params, batch_stats = convert_state_dict(state_dicts["model"], network_def)
    params = jax.tree.map(lambda x: x, params)

    tx = make_optimizer(OptimConfig(), params)
    state = TrainState.create(params, tx, batch_stats or None,
                              use_ema="model_ema" in state_dicts)
    if "model_ema" in state_dicts:
        ema_params, _ = convert_state_dict(state_dicts["model_ema"], network_def)
        state = state.replace(ema_params=ema_params)

    mgr = CheckpointManager(args.out, snapshot_every=0)
    mgr.save("checkpoint", state, {"converted_from": args.torch_ckpt})
    print(f"wrote {args.out}/checkpoint")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
