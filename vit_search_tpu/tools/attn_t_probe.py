"""Probe: which ATTN_T kernel/stage fails the TPU Mosaic compile.

Builds each stage's fused_attention_qkv_t fwd or fwd+bwd in isolation and
reports compile success/failure — one case per process so a compile-helper
SIGKILL/timeout is attributable.  This is the instrument behind the
PERF.md round-5 rejection record of the sequence-major layout experiment
(ops/pallas/attention.py).

Usage: python -m vit_search_tpu.tools.attn_t_probe STAGE_IDX {fwd,bwd}
"""
import sys

import numpy as np

STAGES = [  # (n_seq, batch, width) at the bench's 224px supernet shapes
    ("stage1", 257, 512, 192),
    ("stage2", 65, 512, 576),
    ("stage3", 17, 512, 768),
]


def main():
    idx, mode = int(sys.argv[1]), sys.argv[2]
    name, n, b, w = STAGES[idx]

    import jax
    import jax.numpy as jnp

    from vit_search_tpu.ops.pallas.attention import fused_attention_qkv_t

    # the model's head counts: stage1 6x32, stage2 12x48, stage3 12x64
    heads = {192: 6, 576: 12, 768: 12}[w]
    scale = (w // heads) ** -0.5

    qkv = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, b, 3 * w)).astype(np.float32)).astype(jnp.bfloat16)

    if mode == "fwd":
        fn = jax.jit(lambda x: fused_attention_qkv_t(x, scale, heads))
    else:
        def loss(x):
            return jnp.sum(fused_attention_qkv_t(x, scale, heads)
                           .astype(jnp.float32))
        fn = jax.jit(jax.grad(loss))

    out = fn(qkv)
    out = jax.block_until_ready(out)
    v = float(jnp.sum(out.astype(jnp.float32)))
    print(f"OK {name} {mode}: sum={v:.3f}")


if __name__ == "__main__":
    main()
