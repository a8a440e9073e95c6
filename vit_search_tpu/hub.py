"""Model hub entry points (reference ``hubconf.py``/``models.py`` parity).

The reference exposes DeiT models through torch.hub with pretrained-URL
loading (hubconf.py:7-9, models.py:15-57).  Equivalents here:

- ``load(name, pretrained=True)`` downloads the reference's published
  ``.pth`` for that model into ``~/.cache/vit_search_tpu`` (same URLs as
  models.py:22-53), converts the torch state dict on the fly
  (``tools.convert_torch``) and returns ``(model, variables)``;
- ``load(name, checkpoint=...)`` accepts an orbax checkpoint directory, a
  local ``.pth(.tar)`` torch file, or an ``http(s)://`` URL to either.

In zero-egress environments the download raises a clear error; point
``checkpoint`` at a local file instead.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from .models import available_models, create_model
from .train.checkpoint import restore_raw

dependencies = ["jax", "flax"]  # torch.hub-style declaration, for parity

# reference models.py:22-53
PRETRAINED_URLS = {
    "deit_tiny_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_tiny_patch16_224-a1311bcf.pth",
    "deit_small_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_small_patch16_224-cd65a155.pth",
    "deit_base_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_224-b5f2ef4d.pth",
}

TORCH_SUFFIXES = (".pth", ".pth.tar", ".pt", ".bin")
_TORCH_SUFFIXES = TORCH_SUFFIXES  # back-compat alias


def cache_dir() -> str:
    return os.environ.get(
        "VST_HUB_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vit_search_tpu"))


def download(url: str, dest_dir: Optional[str] = None) -> str:
    """Fetch ``url`` into the hub cache (idempotent); returns the path."""
    import urllib.parse
    import urllib.request

    dest_dir = dest_dir or cache_dir()
    os.makedirs(dest_dir, exist_ok=True)
    fname = os.path.basename(urllib.parse.urlparse(url).path) or "checkpoint"
    dest = os.path.join(dest_dir, fname)
    if os.path.exists(dest):
        return dest
    tmp = dest + ".tmp"
    try:
        urllib.request.urlretrieve(url, tmp)
    except OSError as e:
        raise RuntimeError(
            f"could not download {url} ({e}); in offline environments pass "
            f"checkpoint=<local path> instead") from e
    os.replace(tmp, dest)
    return dest


def _load_torch_variables(path: str, model) -> dict:
    from .tools.convert_torch import convert_state_dict, load_torch_checkpoint

    state_dicts = load_torch_checkpoint(path)
    params, batch_stats = convert_state_dict(state_dicts["model"],
                                             model.network_def)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def load(name: str, checkpoint: Optional[str] = None, pretrained: bool = False,
         img_size: int = 224, seed: int = 0, **kwargs) -> Tuple[Any, dict]:
    """Create a registered model and (optionally) load trained weights."""
    import jax
    import jax.numpy as jnp

    model = create_model(name, img_size=img_size, **kwargs)
    sample = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(seed), sample))

    if pretrained and not checkpoint:
        if name not in PRETRAINED_URLS:
            raise ValueError(
                f"no published pretrained weights for {name!r}; available: "
                f"{sorted(PRETRAINED_URLS)}")
        checkpoint = PRETRAINED_URLS[name]
    if checkpoint and checkpoint.startswith(("http://", "https://")):
        checkpoint = download(checkpoint)

    if checkpoint:
        if checkpoint.endswith(_TORCH_SUFFIXES):
            variables.update(_load_torch_variables(checkpoint, model))
        else:
            raw = restore_raw(checkpoint)
            variables["params"] = raw.get("ema_params") or raw["params"]
            if raw.get("batch_stats"):
                variables["batch_stats"] = raw["batch_stats"]
    return model, variables


def list_models():
    return available_models()
