"""Numerics deviation of --gelu tanh vs exact on a trained checkpoint.

Loads a trained model checkpoint, runs the SAME val batch through the
forward pass with exact-erf GELU and with the tanh approximation, and
reports max/mean |delta logit| and top-1 prediction agreement — the
instrument behind the PERF.md round-5 "GELU numerics" table.

Usage: python -m vit_search_tpu.tools.gelu_delta \
           CKPT_DIR DATA_DIR NETWORK_DEF_FILE [input_size]
"""
import os
import sys

import numpy as np


def main():
    ckpt_dir, data_dir, def_file = sys.argv[1], sys.argv[2], sys.argv[3]
    input_size = int(sys.argv[4]) if len(sys.argv) > 4 else 112

    import jax
    import jax.numpy as jnp

    from vit_search_tpu import arch, data, models, train

    net = arch.parse_network_def(open(def_file).read().strip())
    model = models.create_model(
        "flexible_vit_sr_patch14_224_patch_output",
        network_def=net, img_size=input_size, dtype=jnp.bfloat16)

    raw = train.restore_raw(os.path.join(ckpt_dir, "checkpoints", "checkpoint"))
    variables = {"params": raw["params"]}
    if raw.get("batch_stats"):
        variables["batch_stats"] = raw["batch_stats"]

    ds = data.build_dataset(False, data_set="IMNET", data_path=data_dir,
                            transform=data.EvalTransform(size=input_size))
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ds), size=256, replace=False)
    imgs, labels = [], []
    for i in idx:
        img, lbl = ds.load(int(i), rng)
        imgs.append(np.asarray(img))
        labels.append(lbl)
    x = np.stack(imgs).astype(np.float32) / 255.0
    mean = np.asarray(data.IMAGENET_MEAN, np.float32).reshape(1, 1, 1, -1)
    std = np.asarray(data.IMAGENET_STD, np.float32).reshape(1, 1, 1, -1)
    batch = jnp.asarray((x - mean) / std)
    labels = np.asarray(labels)

    def fwd(flavor):
        prior = os.environ.get("VST_GELU")
        os.environ["VST_GELU"] = flavor
        try:
            fn = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))
            return np.asarray(fn(variables, batch), np.float32)
        finally:
            if prior is None:
                os.environ.pop("VST_GELU", None)
            else:
                os.environ["VST_GELU"] = prior

    exact = fwd("exact")
    tanh = fwd("tanh")
    d = np.abs(exact - tanh)
    pe, pt = exact.argmax(-1), tanh.argmax(-1)
    print(f"batch: {batch.shape}, logits: {exact.shape}")
    print(f"max |dlogit|  = {d.max():.6f}")
    print(f"mean |dlogit| = {d.mean():.6f}")
    print(f"logit scale (mean |exact|) = {np.abs(exact).mean():.4f}")
    print(f"top-1 agreement = {(pe == pt).mean() * 100:.2f}% "
          f"({(pe != pt).sum()}/{len(pe)} differ)")
    print(f"top-1 acc exact = {(pe == labels).mean() * 100:.2f}%  "
          f"tanh = {(pt == labels).mean() * 100:.2f}%")


if __name__ == "__main__":
    main()
