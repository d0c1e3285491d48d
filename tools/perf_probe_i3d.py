"""Stage-level TPU timing probe for the I3D member forward (VERDICT r4 #1).

Times each resolution stage of the I3D trunk (reference graph
train.py:1013-1193) in isolation at the bench's shipping geometry
(B=96, 20x224x224 bf16, prestaged s2d stem) and reports ms/iter and
achieved TFLOP/s per stage, so the Mixed-block fusion campaign attacks
the actual hot spots instead of guesses.

Variants per inception block:
  base   - the shipping structure: 6 separate ConvBN convs
  fused  - the three 1x1x1 convs reading the block input (b0_1x1,
           b1_1x1, b2_1x1) concatenated into ONE conv (kernels concat on
           the output-feature axis; exact same math) + the b1/b2 3x3x3
           convs merged into ONE conv over the concatenated reduced
           channels with a block-diagonal kernel (zero cross blocks).

Timing protocol per CLAUDE.md: chain a scalar carry across iterations and
fetch once (block_until_ready is a no-op through the axon relay).

Usage:  python tools/perf_probe_i3d.py [--batch 96] [--iters 8]
        [--exp stem,stage3,stage4,stage5,full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from crowded_scenes_ensemble_classification_tpu.models.i3d import INCEPTION_SPECS

DN = ("NDHWC", "DHWIO", "NDHWC")


# ---------------------------------------------------------------- params
def _conv_p(key, k, cin, cout):
    w = jax.random.normal(key, (*k, cin, cout), jnp.float32) * 0.05
    return {
        "w": w.astype(jnp.bfloat16),
        "s": jnp.ones((cout,), jnp.bfloat16),
        "b": jnp.zeros((cout,), jnp.bfloat16),
    }


def _cbn(x, p, strides=(1, 1, 1)):
    y = jax.lax.conv_general_dilated(
        x, p["w"], strides, "SAME", dimension_numbers=DN
    )
    return jax.nn.relu(y * p["s"] + p["b"])  # inference BN = affine


def conv_flops(shape_out, cin, k, cout=None):
    b, t, h, w, c = shape_out
    return 2.0 * b * t * h * w * (cout or c) * cin * k[0] * k[1] * k[2]


# ------------------------------------------------------------- inception
def block_params(key, cin, spec, variant):
    b0, b1r, b1, b2r, b2, b3 = spec
    ks = jax.random.split(key, 8)
    if variant == "base":
        return {
            "b0": _conv_p(ks[0], (1, 1, 1), cin, b0),
            "b1r": _conv_p(ks[1], (1, 1, 1), cin, b1r),
            "b1": _conv_p(ks[2], (3, 3, 3), b1r, b1),
            "b2r": _conv_p(ks[3], (1, 1, 1), cin, b2r),
            "b2": _conv_p(ks[4], (3, 3, 3), b2r, b2),
            "b3": _conv_p(ks[5], (1, 1, 1), cin, b3),
        }
    if variant == "f1x1":
        # ONLY the three 1x1x1 input convs fused (zero extra FLOPs);
        # 3x3x3 convs stay separate
        return {
            "red": _conv_p(ks[0], (1, 1, 1), cin, b0 + b1r + b2r),
            "b1": _conv_p(ks[2], (3, 3, 3), b1r, b1),
            "b2": _conv_p(ks[4], (3, 3, 3), b2r, b2),
            "b3": _conv_p(ks[5], (1, 1, 1), cin, b3),
        }
    # fused: one (1,1,1,cin,b0+b1r+b2r) reduce conv + one block-diagonal
    # (3,3,3,b1r+b2r,b1+b2) conv
    red = _conv_p(ks[0], (1, 1, 1), cin, b0 + b1r + b2r)
    w33 = np.zeros((3, 3, 3, b1r + b2r, b1 + b2), np.float32)
    w33[:, :, :, :b1r, :b1] = np.asarray(
        jax.random.normal(ks[1], (3, 3, 3, b1r, b1)) * 0.05
    )
    w33[:, :, :, b1r:, b1:] = np.asarray(
        jax.random.normal(ks[2], (3, 3, 3, b2r, b2)) * 0.05
    )
    return {
        "red": red,
        "f33": {
            "w": jnp.asarray(w33, jnp.bfloat16),
            "s": jnp.ones((b1 + b2,), jnp.bfloat16),
            "b": jnp.zeros((b1 + b2,), jnp.bfloat16),
        },
        "b3": _conv_p(ks[5], (1, 1, 1), cin, b3),
    }


def inception(x, p, spec, variant, pool="xla"):
    b0, b1r, b1, b2r, b2, b3 = spec
    if pool == "pallas":
        from crowded_scenes_ensemble_classification_tpu.ops.pallas.maxpool import (
            max_pool_3x3x3_same,
        )

        mp = max_pool_3x3x3_same(x)
    else:
        import flax.linen as nn

        mp = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
    br3 = _cbn(mp, p["b3"])
    if variant == "base":
        br0 = _cbn(x, p["b0"])
        y1 = _cbn(x, p["b1r"])
        y2 = _cbn(x, p["b2r"])
        br1 = _cbn(y1, p["b1"])
        br2 = _cbn(y2, p["b2"])
        return jnp.concatenate([br0, br1, br2, br3], -1)
    red = _cbn(x, p["red"])
    br0 = red[..., :b0]
    if variant == "f1x1":
        br1 = _cbn(red[..., b0 : b0 + b1r], p["b1"])
        br2 = _cbn(red[..., b0 + b1r :], p["b2"])
        return jnp.concatenate([br0, br1, br2, br3], -1)
    y12 = red[..., b0:]
    br12 = _cbn(y12, p["f33"])
    return jnp.concatenate([br0, br12[..., :b1], br12[..., b1:], br3], -1)


def block_flops(shape_in, spec, variant):
    b0, b1r, b1, b2r, b2, b3 = spec
    cin = shape_in[-1]
    f = 0.0
    if variant == "f1x1":
        f += conv_flops(shape_in, cin, (1, 1, 1), b0 + b1r + b2r)
        f += conv_flops(shape_in, b1r, (3, 3, 3), b1)
        f += conv_flops(shape_in, b2r, (3, 3, 3), b2)
        f += conv_flops(shape_in, cin, (1, 1, 1), b3)
    elif variant == "base":
        f += conv_flops(shape_in, cin, (1, 1, 1), b0)
        f += conv_flops(shape_in, cin, (1, 1, 1), b1r)
        f += conv_flops(shape_in, b1r, (3, 3, 3), b1)
        f += conv_flops(shape_in, cin, (1, 1, 1), b2r)
        f += conv_flops(shape_in, b2r, (3, 3, 3), b2)
        f += conv_flops(shape_in, cin, (1, 1, 1), b3)
    else:
        f += conv_flops(shape_in, cin, (1, 1, 1), b0 + b1r + b2r)
        f += conv_flops(shape_in, b1r + b2r, (3, 3, 3), b1 + b2)
        f += conv_flops(shape_in, cin, (1, 1, 1), b3)
    return f


# ---------------------------------------------------------------- stages
def build_stage(name, batch, variant, pool):
    """Returns (fn(params, x, carry)->carry, params, x_shape, flops)."""
    key = jax.random.key(17)

    if name == "stem":
        # prestaged s2d path, as the bench ships: staged input
        # (B,20,115,115,12) -> stem conv (7,4,4)/(2,1,1) -> pools/convs
        # -> (B,10,56,56,192)
        t, hs = 20, 115
        x_shape = (batch, t, hs, hs, 12)
        ks = jax.random.split(key, 3)
        k8 = jax.random.normal(ks[0], (7, 4, 4, 12, 64), jnp.float32) * 0.05
        params = {
            "k8": {
                "w": k8.astype(jnp.bfloat16),
                "s": jnp.ones((64,), jnp.bfloat16),
                "b": jnp.zeros((64,), jnp.bfloat16),
            },
            "c2b": _conv_p(ks[1], (1, 1, 1), 64, 64),
            "c2c": _conv_p(ks[2], (3, 3, 3), 64, 192),
        }

        def fn(p, x, carry):
            import flax.linen as nn

            y = jax.lax.conv_general_dilated(
                x, p["k8"]["w"], (2, 1, 1),
                [(2, 3), (0, 0), (0, 0)], dimension_numbers=DN,
            )
            y = jax.nn.relu(y * p["k8"]["s"] + p["k8"]["b"])
            y = nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
            y = _cbn(y, p["c2b"])
            y = _cbn(y, p["c2c"])
            y = nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
            return carry + jnp.sum(y[..., 0].astype(jnp.float32))

        f = conv_flops((batch, 10, 112, 112, 64), 3, (7, 7, 7))
        f += conv_flops((batch, 10, 56, 56, 64), 64, (1, 1, 1))
        f += conv_flops((batch, 10, 56, 56, 192), 64, (3, 3, 3))
        return fn, params, x_shape, f

    stage_blocks = {
        "stage3": (["Mixed_3b", "Mixed_3c"], (10, 56, 192), True),
        "stage4": (
            ["Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"],
            (5, 28, 480),
            True,
        ),
        "stage5": (["Mixed_5b", "Mixed_5c"], (3, 14, 832), False),
    }
    blocks, (t, hw, cin), trailing_pool = stage_blocks[name]
    x_shape = (batch, t, hw, hw, cin)
    params = {}
    c = cin
    flops = 0.0
    shape = x_shape
    for i, bname in enumerate(blocks):
        spec = INCEPTION_SPECS[bname]
        params[bname] = block_params(jax.random.fold_in(key, i), c, spec, variant)
        flops += block_flops(shape, spec, variant)
        c = spec[0] + spec[2] + spec[4] + spec[5]
        shape = (*shape[:-1], c)

    def fn(p, x, carry):
        import flax.linen as nn

        y = x
        for bname in blocks:
            y = inception(
                y, p[bname], INCEPTION_SPECS[bname], variant,
                pool=pool if hw >= 56 else "xla",
            )
        if trailing_pool:
            win = (3, 3, 3) if name == "stage3" else (2, 2, 2)
            y = nn.max_pool(y, win, strides=(2, 2, 2), padding="SAME")
        return carry + jnp.sum(y[..., 0].astype(jnp.float32))

    return fn, params, x_shape, flops


def run_pools(batch, iters):
    """Standalone timings for every pool op in the trunk — XLA
    reduce_window was measured at ~11% of HBM speed-of-light for the
    in-block 3³/1 case (ops/pallas/maxpool.py docstring); this checks the
    INTER-STAGE strided pools too."""
    import flax.linen as nn

    from crowded_scenes_ensemble_classification_tpu.ops.pallas.maxpool import (
        max_pool_3x3x3_same,
    )

    cases = [
        ("stem (1,3,3)/(1,2,2) @112x64", (batch, 10, 112, 112, 64),
         lambda y: nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2), padding="SAME")),
        ("stem (1,3,3)/(1,2,2) @56x192", (batch, 10, 56, 56, 192),
         lambda y: nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2), padding="SAME")),
        ("s3 tail (3,3,3)/2 @56x480", (batch, 10, 56, 56, 480),
         lambda y: nn.max_pool(y, (3, 3, 3), strides=(2, 2, 2), padding="SAME")),
        ("s4 tail (2,2,2)/2 @28x832", (batch, 5, 28, 28, 832),
         lambda y: nn.max_pool(y, (2, 2, 2), strides=(2, 2, 2), padding="SAME")),
        ("blk xla (3,3,3)/1 @56x192", (batch, 10, 56, 56, 192),
         lambda y: nn.max_pool(y, (3, 3, 3), strides=(1, 1, 1), padding="SAME")),
        ("blk pallas 3x3x3 @56x192", (batch, 10, 56, 56, 192),
         max_pool_3x3x3_same),
        ("blk pallas 3x3x3 @56x256", (batch, 10, 56, 56, 256),
         max_pool_3x3x3_same),
        ("blk xla (3,3,3)/1 @28x480", (batch, 5, 28, 28, 480),
         lambda y: nn.max_pool(y, (3, 3, 3), strides=(1, 1, 1), padding="SAME")),
        ("blk pallas 3x3x3 @28x480", (batch, 5, 28, 28, 480),
         max_pool_3x3x3_same),
        ("blk xla (3,3,3)/1 @14x832", (batch, 3, 14, 14, 832),
         lambda y: nn.max_pool(y, (3, 3, 3), strides=(1, 1, 1), padding="SAME")),
    ]
    for label, shape, op in cases:
        x = jax.jit(
            lambda k, s=shape: (jax.random.uniform(k, s, jnp.float32) - 0.5).astype(
                jnp.bfloat16
            )
        )(jax.random.key(3))
        jfn = jax.jit(lambda a, c, op=op: c + jnp.sum(op(a)[..., 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        _ = float(jfn(x, jnp.float32(0)))
        comp = time.perf_counter() - t0
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = jfn(x, c)
        _ = float(c)
        dt = (time.perf_counter() - t0) / iters
        gb = np.prod(shape) * 2 / 1e9
        print(
            f"pool {label}: {dt*1e3:7.2f} ms  in={gb:.2f} GB "
            f"({gb/dt:.0f} GB/s eff)  (compile {comp:.0f}s)",
            flush=True,
        )


def run(name, batch, iters, variant, pool):
    fn, params, x_shape, flops = build_stage(name, batch, variant, pool)
    x = jax.jit(
        lambda k: (jax.random.uniform(k, x_shape, jnp.float32) - 0.5).astype(
            jnp.bfloat16
        )
    )(jax.random.key(3))
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    carry = jfn(params, x, jnp.float32(0))
    _ = float(carry)
    compile_s = time.perf_counter() - t0
    carry = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = jfn(params, x, carry)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{name:7s} {variant:5s} pool={pool:6s} B={batch}: "
        f"{dt*1e3:8.2f} ms/iter  {flops/dt/1e12:7.2f} TFLOP/s  "
        f"(compile {compile_s:.0f}s, {flops/1e9:.1f} GFLOP)",
        flush=True,
    )
    return dt


def run_prefix(batch, iters, variant, pool, upto):
    """Time stem→…→stage{upto} as ONE jit — per-stage costs derive from
    prefix differences, with no per-stage jit boundary (a stage jit takes
    its input in default layout; inside a full graph XLA lays
    intermediates out freely, so standalone stage times can overstate)."""
    names = ["stem", "stage3", "stage4", "stage5"][: upto + 1]
    parts = []
    x_shape = None
    total_flops = 0.0
    for i, nm in enumerate(names):
        fn, params, shp, fl = build_stage(
            nm, batch, variant if nm != "stem" else "base", pool
        )
        if i == 0:
            x_shape = shp
        parts.append((nm, params))
        total_flops += fl

    # rebuild the chain body (build_stage fns each end in a sum — here we
    # need the raw stage outputs, so re-derive bodies inline)
    import flax.linen as nn

    def chain(ps, x, carry):
        y = x
        # stem
        p = ps["stem"]
        y = jax.lax.conv_general_dilated(
            y, p["k8"]["w"], (2, 1, 1), [(2, 3), (0, 0), (0, 0)],
            dimension_numbers=DN,
        )
        y = jax.nn.relu(y * p["k8"]["s"] + p["k8"]["b"])
        y = nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        y = _cbn(y, p["c2b"])
        y = _cbn(y, p["c2c"])
        y = nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        stage_blocks = {
            "stage3": (["Mixed_3b", "Mixed_3c"], (3, 3, 3)),
            "stage4": (["Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                        "Mixed_4f"], (2, 2, 2)),
            "stage5": (["Mixed_5b", "Mixed_5c"], None),
        }
        for nm2, _pp in parts[1:]:
            blocks, tail = stage_blocks[nm2]
            hw = int(y.shape[2])
            for bname in blocks:
                y = inception(
                    y, ps[nm2][bname], INCEPTION_SPECS[bname],
                    variant, pool=pool if hw >= 56 else "xla",
                )
            if tail is not None:
                y = nn.max_pool(y, tail, strides=(2, 2, 2), padding="SAME")
        return carry + jnp.sum(y[..., 0].astype(jnp.float32))

    ps = {nm: p for nm, p in parts}
    x = jax.jit(
        lambda k: (jax.random.uniform(k, x_shape, jnp.float32) - 0.5).astype(
            jnp.bfloat16
        )
    )(jax.random.key(3))
    jfn = jax.jit(chain)
    t0 = time.perf_counter()
    _ = float(jfn(ps, x, jnp.float32(0)))
    comp = time.perf_counter() - t0
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = jfn(ps, x, c)
    _ = float(c)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"prefix upto={names[-1]:6s} {variant:5s}: {dt*1e3:8.2f} ms "
        f"{total_flops/dt/1e12:7.2f} TFLOP/s (compile {comp:.0f}s)",
        flush=True,
    )
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--exp", default="stem,stage3,stage4,stage5")
    ap.add_argument("--variants", default="base,fused")
    ap.add_argument("--pool", default="pallas")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    total = {}
    for name in args.exp.split(","):
        if name == "pools":
            run_pools(args.batch, args.iters)
            continue
        if name.startswith("prefix"):
            upto = int(name[len("prefix"):] or 3)
            for variant in args.variants.split(","):
                run_prefix(args.batch, args.iters, variant, args.pool, upto)
            continue
        for variant in args.variants.split(","):
            if name == "stem" and variant != "base":
                continue
            dt = run(name, args.batch, args.iters, variant, args.pool)
            total.setdefault(variant, 0.0)
            total[variant] += dt
    for variant, t in total.items():
        print(
            f"TOTAL {variant}: {t*1e3:.1f} ms -> member fwd "
            f"{args.batch/t:.1f} clips/s -> 4-member {args.batch/t/4:.1f} clips/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
