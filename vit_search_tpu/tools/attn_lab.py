"""Round-3 attention-backward lab: transposed-output dots + group sweep.

Timing protocol for the tunneled TPU: each config is ONE jitted program
that chains ITERS kernel calls through a data dependency (lax.fori_loop,
carry perturbs the input so nothing hoists), then a single scalar fetch.
Device time per call = total / ITERS.  Relative numbers are trustworthy;
absolute include pipeline effects.
"""
import functools, time, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# run from the repo root
from vit_search_tpu.ops.pallas import attention as A

_QK_T, _PV, _PT_DO = A._QK_T, A._PV, A._PT_DO
_softmax_rows = A._softmax_rows

# contract m: (G,M,D),(G,N,M) -> (G,D,N)   [lhs dim1, rhs dim2]
_T_OVER_M = (((1,), (2,)), ((0,), (0,)))


def _bwd_kernel_T(qkv_ref, do_ref, dqkv_ref, *, scale, num_heads):
    """Transposed-output dv/dq/dk: sequence dim on lanes (full 128-tiles),
    head dim (32/48/64) on sublanes; one swapaxes per result."""
    width = do_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        qsl = slice(h * d, (h + 1) * d)
        ksl = slice(width + h * d, width + (h + 1) * d)
        vsl = slice(2 * width + h * d, 2 * width + (h + 1) * d)
        q = qkv_ref[:, :, qsl].astype(jnp.float32)
        k = qkv_ref[:, :, ksl].astype(jnp.float32)
        v = qkv_ref[:, :, vsl].astype(jnp.float32)
        do = do_ref[:, :, qsl].astype(jnp.float32)

        s = lax.dot_general(q, k, _QK_T, preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)

        dvT = lax.dot_general(do, p, _PT_DO, preferred_element_type=jnp.float32)   # (g,d,m)
        dp = lax.dot_general(do, v, _QK_T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dqT = lax.dot_general(k, ds, _T_OVER_M, preferred_element_type=jnp.float32)  # (g,d,n)
        dkT = lax.dot_general(q, ds, _PT_DO, preferred_element_type=jnp.float32)   # (g,d,m)

        dqkv_ref[:, :, qsl] = (jnp.swapaxes(dqT, 1, 2) * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, ksl] = (jnp.swapaxes(dkT, 1, 2) * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, vsl] = jnp.swapaxes(dvT, 1, 2).astype(dqkv_ref.dtype)


def _fwd_kernel_T(qkv_ref, o_ref, *, scale, num_heads):
    """Forward with transposed-output context dot."""
    width = o_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        q = qkv_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv_ref[:, :, width + h * d:width + (h + 1) * d].astype(jnp.float32)
        s = lax.dot_general(q, k, _QK_T, preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)
        v = qkv_ref[:, :, 2 * width + h * d:2 * width + (h + 1) * d]
        oT = lax.dot_general(v.astype(p.dtype), p, _T_OVER_M,
                             preferred_element_type=jnp.float32)  # (g,d,n)
        o_ref[:, :, h * d:(h + 1) * d] = jnp.swapaxes(oT, 1, 2).astype(o_ref.dtype)


def call_bwd(kern, qkv, do, scale, H, g):
    b, n, w3 = qkv.shape
    w = w3 // 3
    return pl.pallas_call(
        functools.partial(kern, scale=scale, num_heads=H),
        grid=(b // g,),
        in_specs=[A._spec(g, n, w3), A._spec(g, n, w)],
        out_specs=A._spec(g, n, w3),
        out_shape=jax.ShapeDtypeStruct((b, n, w3), qkv.dtype),
    )(qkv, do)


def call_fwd(kern, qkv, scale, H, g):
    b, n, w3 = qkv.shape
    w = w3 // 3
    return pl.pallas_call(
        functools.partial(kern, scale=scale, num_heads=H),
        grid=(b // g,),
        in_specs=[A._spec(g, n, w3)],
        out_specs=A._spec(g, n, w),
        out_shape=jax.ShapeDtypeStruct((b, n, w), qkv.dtype),
    )(qkv)


ITERS = 30


def time_chained(make_call, qkv, do=None, iters=ITERS):
    """One jit: chain iters calls via a carry-dependent input scale."""
    if do is None:
        def body(i, c):
            out = make_call(qkv * (1.0 + c * 1e-30).astype(qkv.dtype))
            return c + out[0, 0, 0].astype(jnp.float32)
        fn = jax.jit(lambda: lax.fori_loop(0, iters, body, jnp.float32(0.0)))
    else:
        def body(i, c):
            out = make_call(qkv * (1.0 + c * 1e-30).astype(qkv.dtype), do)
            return c + out[0, 0, 0].astype(jnp.float32)
        fn = jax.jit(lambda: lax.fori_loop(0, iters, body, jnp.float32(0.0)))
    float(fn())  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


SHAPES = [("stage1", 512, 258, 6, 32),
          ("stage2", 512, 66, 12, 48),
          ("stage3", 512, 18, 12, 64)]


def _dq_kernel(qkv_ref, do_ref, dq_ref, *, scale, num_heads):
    """Two-kernel split, part 1: dq only (5 I/O width-columns vs 7).

    Recomputes s,p per kernel — the split trades +2 score dots for less
    live VMEM per grid cell (round-2 verdict's named variant)."""
    width = do_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        qsl = slice(h * d, (h + 1) * d)
        ksl = slice(width + h * d, width + (h + 1) * d)
        vsl = slice(2 * width + h * d, 2 * width + (h + 1) * d)
        q = qkv_ref[:, :, qsl].astype(jnp.float32)
        k = qkv_ref[:, :, ksl].astype(jnp.float32)
        v = qkv_ref[:, :, vsl].astype(jnp.float32)
        do = do_ref[:, :, qsl].astype(jnp.float32)
        s = lax.dot_general(q, k, _QK_T, preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)
        dp = lax.dot_general(do, v, _QK_T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
        dq_ref[:, :, qsl] = dq.astype(dq_ref.dtype)


def _dkv_kernel(qkv_ref, do_ref, dkv_ref, *, scale, num_heads):
    """Two-kernel split, part 2: dk and dv (6 I/O width-columns)."""
    width = do_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        qsl = slice(h * d, (h + 1) * d)
        ksl = slice(width + h * d, width + (h + 1) * d)
        vsl = slice(2 * width + h * d, 2 * width + (h + 1) * d)
        q = qkv_ref[:, :, qsl].astype(jnp.float32)
        k = qkv_ref[:, :, ksl].astype(jnp.float32)
        v = qkv_ref[:, :, vsl].astype(jnp.float32)
        do = do_ref[:, :, qsl].astype(jnp.float32)
        s = lax.dot_general(q, k, _QK_T, preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)
        dv = lax.dot_general(p, do, _PT_DO, preferred_element_type=jnp.float32)
        dp = lax.dot_general(do, v, _QK_T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dk = lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale
        dkv_ref[:, :, qsl] = dk.astype(dkv_ref.dtype)
        dkv_ref[:, :, h * d + width:(h + 1) * d + width] = dv.astype(dkv_ref.dtype)


def call_split(qkv, do, scale, H, g):
    b, n, w3 = qkv.shape
    w = w3 // 3
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, num_heads=H),
        grid=(b // g,),
        in_specs=[A._spec(g, n, w3), A._spec(g, n, w)],
        out_specs=A._spec(g, n, w),
        out_shape=jax.ShapeDtypeStruct((b, n, w), qkv.dtype),
    )(qkv, do)
    dkv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, num_heads=H),
        grid=(b // g,),
        in_specs=[A._spec(g, n, w3), A._spec(g, n, w)],
        out_specs=A._spec(g, n, 2 * w),
        out_shape=jax.ShapeDtypeStruct((b, n, 2 * w), qkv.dtype),
    )(qkv, do)
    return jnp.concatenate([dq, dkv], axis=-1)


def main_split():
    """dq vs dk/dv split study: does less live VMEM per kernel buy a
    larger compilable group, and does that beat the score recompute?"""
    rng = np.random.default_rng(0)
    for name, B, N, H, D in SHAPES:
        W = H * D
        qkv = jnp.asarray(rng.normal(size=(B, N, 3 * W))).astype(jnp.bfloat16)
        do = jnp.asarray(rng.normal(size=(B, N, W))).astype(jnp.bfloat16)
        scale = D ** -0.5
        gb = A._pick_group(B, N, W, score_tiles=3, io_rows=7, itemsize=2)

        t0 = time.perf_counter()
        base = jax.jit(lambda x, d_: call_bwd(A._bwd_kernel_qkv, x, d_, scale, H, gb))(qkv, do)
        split = jax.jit(lambda x, d_: call_split(x, d_, scale, H, gb))(qkv, do)
        err = float(jnp.max(jnp.abs(base.astype(jnp.float32)
                                    - split.astype(jnp.float32))))
        print(f"== {name} B{B} N{N} H{H} D{D} gb={gb} err={err:.2e} "
              f"[compile {time.perf_counter()-t0:.0f}s]", flush=True)

        t = time_chained(lambda x, d_: call_bwd(A._bwd_kernel_qkv, x, d_, scale, H, gb), qkv, do)
        print(f"  base   g={gb:2d} : {t:7.3f} ms", flush=True)
        for g in sorted({gb, 2 * gb, 4 * gb, 16}):
            if g > B or B % g:
                continue
            try:
                t = time_chained(lambda x, d_: call_split(x, d_, scale, H, g), qkv, do)
                print(f"  split  g={g:2d} : {t:7.3f} ms", flush=True)
            except Exception as e:
                print(f"  split  g={g:2d} : FAIL {str(e)[:90]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    for name, B, N, H, D in SHAPES:
        W = H * D
        qkv = jnp.asarray(rng.normal(size=(B, N, 3 * W))).astype(jnp.bfloat16)
        do = jnp.asarray(rng.normal(size=(B, N, W))).astype(jnp.bfloat16)
        scale = D ** -0.5
        gb = A._pick_group(B, N, W, score_tiles=3, io_rows=7, itemsize=2)
        gf = A._pick_group(B, N, W, score_tiles=2, io_rows=4, itemsize=2)

        # numerics check (baseline vs transposed); max-abs-diff reduced on
        # device, only the scalar crosses the tunnel
        print(f"[{name}] compiling baseline bwd...", flush=True)
        t0 = time.perf_counter()
        base = jax.jit(lambda x, d_: call_bwd(A._bwd_kernel_qkv, x, d_, scale, H, gb))(qkv, do)
        s0 = float(jnp.sum(jnp.abs(base.astype(jnp.float32))))
        print(f"  base bwd compiled [{time.perf_counter()-t0:.0f}s]", flush=True)
        t0 = time.perf_counter()
        trans = jax.jit(lambda x, d_: call_bwd(_bwd_kernel_T, x, d_, scale, H, gb))(qkv, do)
        err = float(jnp.max(jnp.abs(base.astype(jnp.float32) - trans.astype(jnp.float32))))
        print(f"  T bwd compiled [{time.perf_counter()-t0:.0f}s]", flush=True)
        t0 = time.perf_counter()
        fb = jax.jit(lambda x: call_fwd(A._fwd_kernel_qkv, x, scale, H, gf))(qkv)
        ft = jax.jit(lambda x: call_fwd(_fwd_kernel_T, x, scale, H, gf))(qkv)
        ferr = float(jnp.max(jnp.abs(fb.astype(jnp.float32) - ft.astype(jnp.float32))))
        print(f"  fwd pair compiled [{time.perf_counter()-t0:.0f}s]", flush=True)
        print(f"== {name} B{B} N{N} H{H} D{D} (gf={gf} gb={gb}) "
              f"bwd_err={err:.2e} fwd_err={ferr:.2e}", flush=True)

        for g in sorted({gb, min(4, B), min(8, B)}):
            if B % g:
                continue
            for tag, kern in [("base", A._bwd_kernel_qkv), ("T", _bwd_kernel_T)]:
                try:
                    t = time_chained(lambda x, d_: call_bwd(kern, x, d_, scale, H, g), qkv, do)
                    print(f"  bwd g={g:2d} {tag:5s}: {t:7.3f} ms", flush=True)
                except Exception as e:
                    print(f"  bwd g={g:2d} {tag:5s}: FAIL {str(e)[:90]}", flush=True)
        for g in sorted({gf, min(8, B), min(16, B)}):
            if B % g:
                continue
            for tag, kern in [("base", A._fwd_kernel_qkv), ("T", _fwd_kernel_T)]:
                try:
                    t = time_chained(lambda x: call_fwd(kern, x, scale, H, g), qkv)
                    print(f"  fwd g={g:2d} {tag:5s}: {t:7.3f} ms", flush=True)
                except Exception as e:
                    print(f"  fwd g={g:2d} {tag:5s}: FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    if "--variant" in sys.argv and "split" in sys.argv:
        main_split()
    else:
        main()
