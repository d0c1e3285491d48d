"""On-chip train-step decomposition (VERDICT r4 item 3).

BENCH_r04 measured train_clips_per_sec_i3d = 139.8 at B=16 — ~34% of
bf16 peak on an XLA-cost-analysis FLOP basis, vs ~70% for the member
forward.  This probe finds where the backward's time goes, mirroring
tools/perf_probe_member.py's methodology: every measurement is the FULL
jitted graph the engine runs (make_resident_train_step's body), never
per-stage jit boundaries (round-4 lesson: those force layout
materialization and inflated every stage 2.3×).

Decomposition is by GRAPH SUBTRACTION at fixed batch:
  full        = augment + fwd + bwd + optimizer update   (the real step)
  no_augment  = fwd + bwd + update (augment=False)       → augment cost
  fwd_loss    = augment + fwd only (no grad/update)      → bwd+update cost
plus a batch sweep (the member forward only reached 70% MFU at B=96;
training at B=16 may simply be under-batched) and a remat A/B when the
larger batches OOM.

Usage:  python tools/perf_probe_train.py [--model I3D] [--batches 16,32,48]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="I3D")
    ap.add_argument("--batches", default="16,32,48")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--epochs-per-batch", type=int, default=1)
    ap.add_argument("--remat", action="store_true",
                    help="also time the full step with remat inception "
                         "blocks (memory-for-FLOPs; lets larger batches fit)")
    ap.add_argument("--remat-blocks", default=None,
                    help="also time the full step with SELECTIVE remat of "
                         "these comma-separated Mixed_* blocks (I3D family)")
    ap.add_argument("--full-only", action="store_true",
                    help="skip the graph-subtraction decomposition stages; "
                         "time only the full step (+ any remat variants) — "
                         "for batch/remat A/Bs where the decomposition is "
                         "already known")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from crowded_scenes_ensemble_classification_tpu.data.resident import (
        ResidentClips,
    )
    from crowded_scenes_ensemble_classification_tpu.models import build_model
    from crowded_scenes_ensemble_classification_tpu.train import (
        TrainState,
        make_optimizer,
        make_resident_train_step,
    )
    from crowded_scenes_ensemble_classification_tpu.train.engine import (
        _make_dense_train_body,
        _preprocess,
    )

    mt = args.model
    bundle = build_model(mt, num_classes=11, dtype=jnp.bfloat16)
    hw = (bundle.clip.height, bundle.clip.width)
    t_frames = bundle.clip.frames
    stage = (hw[0] + 32, hw[1] + 32)
    tx = make_optimizer(mt, 0.003)
    rng = np.random.default_rng(7)
    cw = jnp.ones((11,), jnp.float32)

    fp = None
    if bundle.two_stream:
        from crowded_scenes_ensemble_classification_tpu.flow.farneback import (
            flow_schedule_params,
        )

        fp = flow_schedule_params("turbo")

    def make_data(b):
        n = 2 * b
        arrays = {
            "rgb": rng.integers(0, 255, (n, t_frames, stage[0], stage[1], 3), np.uint8)
        }
        if bundle.two_stream:
            gray = arrays["rgb"].mean(-1, keepdims=True).astype(np.float32)
            arrays["gray"] = gray
            arrays["gray_next"] = np.roll(gray, -1, axis=1)
        labels = rng.integers(0, 11, n)
        return ResidentClips(arrays, labels, batch_size=b, seed=0)

    def fresh_state():
        return TrainState.create(
            bundle.init(jax.random.key(0), batch_size=1), tx, jax.random.key(1)
        )

    def timed_steps(step, state, rc, b, label):
        """Compile + steady-state rate for a (state, batch, cw) step fn."""
        try:
            t0 = time.perf_counter()
            state, mtr = step(state, next(iter(rc.batches(0))), cw)
            _ = float(mtr["loss"])
            compile_s = time.perf_counter() - t0
            n_steps = 0
            t0 = time.perf_counter()
            for e in range(args.iters):
                for batch in rc.batches(e + 1):
                    state, mtr = step(state, batch, cw)
                    n_steps += 1
            _ = float(mtr["loss"])
            dt = time.perf_counter() - t0
            rate = b * n_steps / dt
            ms = 1e3 * dt / n_steps
            print(
                f"  {label:<22} {ms:8.1f} ms/step  {rate:8.1f} clips/s"
                f"  (compile {compile_s:.0f}s)",
                flush=True,
            )
            return rate
        except Exception as e:
            print(f"  {label:<22} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
            return None

    def make_fwd_loss_step(augment, train_mode=False):
        """Same graph as the train step minus grad/update: augment +
        forward + weighted-CE loss.  train_mode=False is the inference
        cost floor; train_mode=True adds BN batch-statistics + dropout
        (mutable batch_stats), isolating the train-mode forward premium
        from the backward."""
        import optax as _optax

        def fwd_train(state, batch, class_weights):
            from crowded_scenes_ensemble_classification_tpu.train.engine import (
                _make_resident_gather,
            )

            gather = _make_resident_gather(None, "data")
            dense = gather(batch["resident"], batch["indices"])
            dense["valid"] = batch["valid"]
            rngk = jax.random.fold_in(state.rng, state.step)
            rng_aug, rng_drop = jax.random.split(rngk)
            inputs = _preprocess(
                dense, rng_aug, hw, augment, 0.75, bundle.two_stream, 1.0,
                False, fp, False,
            )
            variables = state.variables()
            mutable = ["batch_stats"] if state.batch_stats else []
            logits, _mut = bundle.apply(
                variables, inputs, train=True, rngs={"dropout": rng_drop},
                mutable=mutable,
            )
            ce = _optax.softmax_cross_entropy_with_integer_labels(
                logits, dense["label"].astype(jnp.int32)
            )
            return state.replace(step=state.step + 1), {"loss": jnp.mean(ce)}

        if train_mode:
            return jax.jit(fwd_train, donate_argnums=(0,))

        def fwd(state, batch, class_weights):
            from crowded_scenes_ensemble_classification_tpu.train.engine import (
                _make_resident_gather,
            )

            gather = _make_resident_gather(None, "data")
            dense = gather(batch["resident"], batch["indices"])
            dense["valid"] = batch["valid"]
            rngk = jax.random.fold_in(state.rng, state.step)
            inputs = _preprocess(
                dense, rngk, hw, augment, 0.75, bundle.two_stream, 1.0,
                False, fp, False,
            )
            logits = bundle.apply(state.variables(), inputs, train=False)
            ce = _optax.softmax_cross_entropy_with_integer_labels(
                logits, dense["label"].astype(jnp.int32)
            )
            loss = jnp.mean(ce)
            return state.replace(step=state.step + 1), {"loss": loss}

        return jax.jit(fwd, donate_argnums=(0,))

    print(f"== {mt} resident train-step decomposition ==", flush=True)
    for b in [int(x) for x in args.batches.split(",")]:
        print(f"batch {b}:", flush=True)
        rc = make_data(b)
        _ = float(jnp.sum(rc.resident["label"].astype(jnp.int32)))

        full = make_resident_train_step(
            bundle, tx, hw, augment=True, input_scale=1.0, flow_params=fp
        )
        r_full = timed_steps(full, fresh_state(), rc, b, "full step")
        r_na = r_fwd = r_fwdt = None
        if not args.full_only:
            no_aug = make_resident_train_step(
                bundle, tx, hw, augment=False, input_scale=1.0, flow_params=fp
            )
            r_na = timed_steps(no_aug, fresh_state(), rc, b, "no-augment step")
            r_fwd = timed_steps(
                make_fwd_loss_step(True), fresh_state(), rc, b,
                "fwd+loss (infer-mode)",
            )
            r_fwdt = timed_steps(
                make_fwd_loss_step(True, train_mode=True), fresh_state(), rc, b,
                "fwd+loss (train-mode)",
            )
        if args.remat and "I3D" in mt:
            rbundle = build_model(
                mt, num_classes=11, dtype=jnp.bfloat16, remat=True
            )
            full_r = make_resident_train_step(
                rbundle, tx, hw, augment=True, input_scale=1.0, flow_params=fp
            )
            timed_steps(full_r, fresh_state(), rc, b, "full step (remat)")
        if args.remat_blocks and "I3D" in mt:
            blocks = tuple(
                s.strip() for s in args.remat_blocks.split(",") if s.strip()
            )
            sbundle = build_model(
                mt, num_classes=11, dtype=jnp.bfloat16, remat_blocks=blocks
            )
            full_s = make_resident_train_step(
                sbundle, tx, hw, augment=True, input_scale=1.0, flow_params=fp
            )
            timed_steps(
                full_s, fresh_state(), rc, b,
                f"full step (remat:{len(blocks)})",
            )
        if r_full and r_na and r_fwd and r_fwdt:
            ms = lambda r: 1e3 * b / r
            print(
                f"  -> augment {ms(r_full) - ms(r_na):.1f} ms,"
                f" BN/dropout premium {ms(r_fwdt) - ms(r_fwd):.1f} ms,"
                f" bwd+update {ms(r_full) - ms(r_fwdt):.1f} ms,"
                f" fwd infer-mode {ms(r_fwd):.1f} ms"
                f"  [bwd/fwd_t = {(ms(r_full) - ms(r_fwdt)) / max(ms(r_fwdt), 1e-9):.2f}]",
                flush=True,
            )


if __name__ == "__main__":
    main()
