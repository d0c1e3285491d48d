"""TPU timing: bf16 vs dynamic-int8 vs static-int8 I3D member forward
(VERDICT r4 #2 — make int8 win or prove it can't).

qstats for the static path are FABRICATED (all act_absmax = 100): the
throughput is independent of the scale values, and this avoids paying a
full f32 calibration-model compile on the relay just to time the int8
executable.  Accuracy of the static path is gated on CPU in
tests/test_quant.py.
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
    ap.add_argument("--modes", default="bf16,static,dynamic")
    ap.add_argument("--fuse", action="store_true",
                    help="fuse_1x1=True inception blocks (exact rewrite)")
    ap.add_argument("--quant-blocks", default=None,
                    help="block policy for the static mode: 'mixed' "
                         "(models.quantize.MIXED_INT8_POLICY) or a comma "
                         "list of stem/Mixed_* sites")
    ap.add_argument("--ab", action="store_true",
                    help="per-site A/B (VERDICT r4 item 4): time bf16, "
                         "all-int8, the mixed policy, and static-int8 at "
                         "each single site alone — the per-block win/loss "
                         "table that justifies MIXED_INT8_POLICY")
    args = ap.parse_args()

    from crowded_scenes_ensemble_classification_tpu.ensemble.members import (
        stack_variables,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.models.common import (
        s2d_stem_stage,
    )

    B, T, S = args.batch, 20, 224
    x = jax.jit(
        lambda k: (jax.random.uniform(k, (B, T, S, S, 3), jnp.float32) - 0.5).astype(
            jnp.bfloat16
        )
    )(jax.random.key(3))

    from crowded_scenes_ensemble_classification_tpu.models.quantize import (
        resolve_quant_blocks,
    )

    def bench_mode(mode, quant_blocks=None, tag=""):
        quant = {"bf16": False, "static": "static", "dynamic": True}[mode]
        bundle = build_model(
            "I3D", num_classes=11, dtype=jnp.bfloat16, quant=quant,
            fuse_1x1=args.fuse,
            **(
                {"quant_blocks": resolve_quant_blocks(quant_blocks)}
                if quant_blocks is not None
                else {}
            ),
        )
        prestaged = bundle.module.clone(stem_prestaged=True)
        dummy_xs = s2d_stem_stage(jnp.zeros((1, T, S, S, 3), jnp.bfloat16))
        # init the PRESTAGED form: its stem records its quant stat at its
        # own scope (models.common.PrestagedS2DStemConvBN)
        v = prestaged.init(jax.random.key(0), dummy_xs, train=False)
        if mode == "static":
            # fabricate calibrated scales (timing is scale-independent)
            v = dict(v)
            v["qstats"] = jax.tree_util.tree_map(
                lambda s: jnp.full(s.shape, 100.0, jnp.float32), v["qstats"]
            )
            from crowded_scenes_ensemble_classification_tpu.models.quantize import (
                quantize_variables,
            )

            v = quantize_variables(v)
        stacked = stack_variables([v] * args.members)

        def member_fwd(vv, xin, carry):
            xs = s2d_stem_stage(xin)
            return carry + jnp.sum(
                prestaged.apply(vv, xs, train=False).astype(jnp.float32)
            )

        def ensemble_fwd(sv, xin, carry):
            xs = s2d_stem_stage(xin)
            probs = jax.lax.map(
                lambda vv: jax.nn.softmax(
                    prestaged.apply(vv, xs, train=False), -1
                ),
                sv,
            )
            return carry + jnp.sum(jnp.einsum("mbc->bc", probs))

        timed = [(f"{mode}{tag} 1-member", member_fwd, (v,))]
        if not args.ab:  # per-site sweep times the member forward only
            timed.append(
                (f"{mode}{tag} {args.members}-member", ensemble_fwd, (stacked,))
            )
        for name, fn, fargs in timed:
            jfn = jax.jit(fn)
            t0 = time.perf_counter()
            _ = float(jfn(*fargs, x, jnp.float32(0)))
            comp = time.perf_counter() - t0
            c = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = jfn(*fargs, x, c)
            _ = float(c)
            dt = (time.perf_counter() - t0) / args.iters
            scale = 1 if "1-member" in name else 1
            print(
                f"{name} B={B}: {dt*1e3:8.2f} ms -> "
                f"{B/dt:8.1f} clips/s (compile {comp:.0f}s)",
                flush=True,
            )

    if args.ab:
        # per-block win/loss table: bf16 floor, all-int8 / mixed-policy
        # composites, then int8 at ONE site at a time (marginal value of
        # quantizing that site; everything else stays bf16)
        bench_mode("bf16")
        bench_mode("static", tag=":all")
        bench_mode("static", quant_blocks="mixed", tag=":mixed")
        for site in (
            "Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3",
            "Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
            "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c",
        ):
            bench_mode("static", quant_blocks=site, tag=f":only-{site}")
        return

    for mode in args.modes.split(","):
        bench_mode(
            mode,
            quant_blocks=(args.quant_blocks if mode == "static" else None),
        )


if __name__ == "__main__":
    main()
