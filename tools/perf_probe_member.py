"""Full-member / 4-member I3D forward timing on the real repo modules —
cross-checks bench.py's device_pipeline rate against tools/perf_probe_i3d
stage sums (they disagreed 2.3x in round 4; this isolates which is real).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--fuse", action="store_true",
                    help="fuse_1x1=True inception blocks (exact rewrite)")
    args = ap.parse_args()

    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        stack_variables,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.models.common import (
        s2d_stem_stage,
    )

    B, T, S = args.batch, 20, 224
    bundle = build_model(
        "I3D", num_classes=11, dtype=jnp.bfloat16, fuse_1x1=args.fuse
    )
    prestaged = bundle.module.clone(stem_prestaged=True)
    keys = jax.random.split(jax.random.key(0), args.members)
    dummy = jnp.zeros((1, T, S, S, 3), jnp.bfloat16)
    member_vars = [bundle.module.init(k, dummy, train=False) for k in keys]
    stacked = stack_variables(member_vars)

    x = jax.jit(
        lambda k: (jax.random.uniform(k, (B, T, S, S, 3), jnp.float32) - 0.5).astype(
            jnp.bfloat16
        )
    )(jax.random.key(3))

    def timed(name, fn, *fargs):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        c = jfn(*fargs, jnp.float32(0))
        _ = float(c)
        comp = time.perf_counter() - t0
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = jfn(*fargs, c)
        _ = float(c)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:8.2f} ms/iter (compile {comp:.0f}s)", flush=True)
        return dt

    def member_fwd(v, xin, carry):
        xs = s2d_stem_stage(xin)
        logits = prestaged.apply(v, xs, train=False)
        return carry + jnp.sum(logits.astype(jnp.float32))

    def ensemble_fwd(sv, xin, carry):
        xs = s2d_stem_stage(xin)

        def member(v):
            return jax.nn.softmax(prestaged.apply(v, xs, train=False), -1)

        probs = jax.lax.map(member, sv)
        return carry + jnp.sum(jnp.einsum("mbc->bc", probs))

    dt1 = timed("1-member fwd (real module)", member_fwd, member_vars[0], x)
    dtm = timed(f"{args.members}-member lax.map fwd", ensemble_fwd, stacked, x)
    print(
        f"-> member {B/dt1:.1f} clips/s; ensemble {B/dtm:.1f} clips/s "
        f"(bench r3 device_pipeline was 195.4)",
        flush=True,
    )


if __name__ == "__main__":
    main()
