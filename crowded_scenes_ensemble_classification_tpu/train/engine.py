"""The training/evaluation engine: jitted sharded steps + epoch loop.

Maps the reference `train()` (train.py:1786-1923) and `evaluate()`
(train.py:1925-1971) onto TPU-native machinery:

- ONE jit region per step: device-side augmentation (ops.augment) → forward
  → masked weighted cross-entropy (+ R3D's Keras-style L2 kernel penalty,
  train.py:1292) → optax update.  Host only decodes and stages uint8.
- batch sharded over the mesh's `data` axis, params replicated (reference
  had no data parallelism at all, SURVEY.md §2.2).
- balanced class weights = sklearn 'balanced' recipe (train.py:1900-1912).
- epoch-level control (LR schedules / plateau / early stop / best-val
  checkpointing, train.py:1850-1871) runs on host in callbacks.py.
- NaN guard wired in (the reference imported TerminateOnNaN but never used
  it, train.py:16 — SURVEY.md §5).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ExperimentConfig
from ..models.common import l2_param_penalty
from ..models.registry import ModelBundle
from ..ops.augment import crowd11_augment_batch, identity_resize_batch
from .callbacks import EarlyStopping, LRPolicy, lr_policy_for
from .state import TrainState, get_learning_rate, make_optimizer, set_learning_rate

R3D_L2_WEIGHT = 1e-4  # Keras l2(1e-4) on every R3D kernel (train.py:1292)


def _preprocess(
    batch,
    rng,
    out_hw,
    augment: bool,
    p: float,
    two_stream: bool,
    input_scale: float = 1.0,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
    flow_from_augmented: bool = False,
):
    """uint8 staging batch → float32 model inputs, on device.

    input_scale=1.0 reproduces the reference exactly: raw 0-255 BGR floats
    with NO normalization anywhere (train.py:283-289 — a documented quirk).
    Scratch training is far more stable with input_scale=1/255; weight
    converters for reference checkpoints must use 1.0.

    flow_from_augmented=True (augmented on-device-Farnebäck runs only):
    the gray pairs get the SAME crop/flip decisions as the rgb stream plus
    salt/pepper before flow — the reference's augmented-Farnebäck mode
    computed flow from the augmented frames (train.py:176-184).  The
    default (False) computes flow from the unaugmented staged frames,
    matching the TVL1-augmented mode's semantics (train.py:195-221)."""
    rgb = batch["rgb"].astype(jnp.float32)
    if augment:
        rgb = crowd11_augment_batch(rgb, rng, out_hw, p=p)
    else:
        rgb = identity_resize_batch(rgb, out_hw)
    out = {"rgb": rgb * input_scale}
    if two_stream:
        if "flow" in batch:
            # Precomputed TV-L1 flow: never augmented in the reference
            # (train.py:195-221); plain resize only.  input_scale applies —
            # the u8 quantized flow rides the same raw-pixel convention.
            flow = identity_resize_batch(batch["flow"].astype(jnp.float32), out_hw)
            out["flow"] = flow * input_scale
        else:
            # On-device Farneback from the staged gray frame pairs —
            # the FarneBack_onTheFly mode (train.py:223-239) with the cv2
            # host loop replaced by the flow.farneback kernel.  The gray
            # pairs are first scaled to the reference's flow resolution
            # (max-dim 224, train.py:304-307) so flow VALUES come out in
            # the reference's pixel-unit scale — exactly so per-axis only
            # when staging preserved the source aspect ratio (square
            # staging of non-square sources squashes anisotropically
            # first; PARITY.md row); the fields are then
            # resized spatially only (values unchanged, like cv2.resize
            # on flow frames at train.py:236-238); no input_scale (flow
            # is not 0-255 imagery).
            from ..flow.farneback import (
                FLOW_CHUNK_PAIRS,
                farneback_flow_batch,
                reference_flow_hw,
            )

            kw = dict(flow_params or {})
            kw.setdefault("fast_warp", flow_fast_warp)
            kw.setdefault("chunk_pairs", FLOW_CHUNK_PAIRS)
            gray4 = batch["gray"].astype(jnp.float32)
            gray_next4 = batch["gray_next"].astype(jnp.float32)
            if augment and flow_from_augmented:
                from ..ops.augment import crowd11_augment_gray_pair_batch

                gray4, gray_next4 = crowd11_augment_gray_pair_batch(
                    gray4, gray_next4, rng, p=p
                )
            flow_hw = reference_flow_hw(gray4.shape[2:4])
            if flow_hw != tuple(gray4.shape[2:4]):
                gray4 = identity_resize_batch(gray4, flow_hw)
                gray_next4 = identity_resize_batch(gray_next4, flow_hw)
            gray = gray4[..., 0]
            gray_next = gray_next4[..., 0]
            # flat-batch form — nested vmap halves flow throughput
            # (farneback.farneback_flow_batch)
            flows = farneback_flow_batch(gray, gray_next, **kw)
            if flow_hw != tuple(out_hw):
                flows = identity_resize_batch(flows, out_hw)
            out["flow"] = flows
    return out


def _make_apply_update(
    bundle: ModelBundle,
    tx: optax.GradientTransformation,
    l2_weight: float,
):
    """The shared loss→grad→optax-update body of every train step
    (dense-batch and wire-fed): fn(state, inputs, labels, mask,
    class_weights, rng_drop) → (new_state, metrics)."""

    def apply_update(state: TrainState, inputs, labels, mask, class_weights, rng_drop):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"] if state.batch_stats else []
            logits, new_model_state = bundle.apply(
                variables,
                inputs,
                train=True,
                rngs={"dropout": rng_drop},
                mutable=mutable,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            w = mask * class_weights[labels]
            # Keras class_weight semantics: mean over the batch of ce*w
            # (divide by the valid-sample count, not Σw — the latter would
            # rescale gradients by the batch's mean class weight).
            loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(mask), 1.0)
            if l2_weight > 0.0:
                loss = loss + l2_param_penalty(params, l2_weight)
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )
            new_bs = new_model_state.get("batch_stats", state.batch_stats)
            return loss, (acc, new_bs)

        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss, "accuracy": acc}

    return apply_update


def _make_dense_train_body(
    bundle: ModelBundle,
    tx: optax.GradientTransformation,
    out_hw: Tuple[int, int],
    augment: bool,
    augment_p: float,
    l2_weight: float,
    input_scale: float,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
    flow_from_augmented: bool = False,
):
    """The unjitted dense-batch train body shared by make_train_step and
    make_resident_train_step: fn(state, batch, class_weights) with batch
    holding staged uint8 pixels ("rgb" [+ "flow" | "gray"/"gray_next"]),
    "label" and "valid"."""
    two_stream = bundle.two_stream
    apply_update = _make_apply_update(bundle, tx, l2_weight)

    def train_step(state: TrainState, batch, class_weights):
        rng = jax.random.fold_in(state.rng, state.step)
        rng_aug, rng_drop = jax.random.split(rng)
        inputs = _preprocess(
            batch, rng_aug, out_hw, augment, augment_p, two_stream, input_scale,
            flow_fast_warp, flow_params, flow_from_augmented,
        )
        labels = batch["label"].astype(jnp.int32)
        mask = batch["valid"].astype(jnp.float32)
        return apply_update(state, inputs, labels, mask, class_weights, rng_drop)

    return train_step


def make_train_step(
    bundle: ModelBundle,
    tx: optax.GradientTransformation,
    out_hw: Tuple[int, int],
    augment: bool,
    augment_p: float = 0.75,
    l2_weight: float = 0.0,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    input_scale: float = 1.0,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
    flow_from_augmented: bool = False,
):
    train_step = _make_dense_train_body(
        bundle, tx, out_hw, augment, augment_p, l2_weight, input_scale,
        flow_fast_warp, flow_params, flow_from_augmented,
    )

    if mesh is not None:
        data = NamedSharding(mesh, P(data_axis))
        def train_step_sharded(state, batch, class_weights):
            batch = {
                k: jax.lax.with_sharding_constraint(v, data)
                for k, v in batch.items()
            }
            return train_step(state, batch, class_weights)

        return jax.jit(train_step_sharded, donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,))


def make_wire_train_step(
    bundle: ModelBundle,
    tx: optax.GradientTransformation,
    plan,
    augment_key,
    l2_weight: float = 0.0,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    input_scale: float = 1.0,
):
    """Wire-fed TRAIN step for transfer-constrained host→device links
    (RGB pipelines): fn(state, wire, offsets, step_idx, labels, valid,
    class_weights) → (new_state, metrics).

    The batch arrives as the ragged wire buffer (data.wire_format —
    single-buffer WirePlan, or ShardedWirePlan + mesh for one wire row
    per data-mesh device); the device unpacks it and runs the windowed
    augmentation policy, then the SAME loss/update body as
    make_train_step.  The augmentation key is fold_in(augment_key,
    step_idx) — augment_key must be the key the host plan was built from
    (plan_wire_steps), so the host's packed windows and the device's
    re-derived gates agree; dropout keys derive from state.rng/state.step
    exactly like the dense step.  Loss/grads match make_train_step
    whenever the shipped windows equal the dense path's staged pixels
    (test_train.py parity test).  Two-stream pipelines keep the dense
    path: the reference computes flow from UNAUGMENTED staged frames
    (train.py:195-221), which the augment-destined wire does not carry —
    for transfer-efficient two-stream TRAINING use the HBM-resident mode
    instead (make_resident_train_step: gray pairs upload once and flow is
    computed on device every epoch)."""
    if bundle.two_stream:
        raise ValueError("wire-fed training is RGB-only (see docstring)")

    from ..data.wire_format import (
        ShardedWirePlan,
        make_sharded_wire_unpack,
        make_wire_unpack,
    )
    from ..ops.augment import crowd11_augment_windowed_batch

    if isinstance(plan, ShardedWirePlan):
        if mesh is None:
            raise ValueError("ShardedWirePlan requires a mesh")
        unpack = make_sharded_wire_unpack(plan, mesh, data_axis)
        base = plan.base
    else:
        unpack = make_wire_unpack(plan)
        base = plan
    out_hw, staging_hw = base.out_hw, base.staging_hw
    p, crop_margin = base.p, base.crop_margin
    apply_update = _make_apply_update(bundle, tx, l2_weight)

    def train_step(state: TrainState, wire, offsets, step_idx, labels, valid, class_weights):
        step_key = jax.random.fold_in(augment_key, step_idx)
        rng_drop = jax.random.split(jax.random.fold_in(state.rng, state.step))[1]
        buf = unpack(wire, offsets, step_key)
        x = crowd11_augment_windowed_batch(
            buf.astype(jnp.float32), step_key, out_hw, staging_hw,
            p=p, crop_margin=crop_margin,
        )
        inputs = {"rgb": x * input_scale}
        mask = valid.astype(jnp.float32)
        return apply_update(
            state, inputs, labels.astype(jnp.int32), mask, class_weights, rng_drop
        )

    if mesh is not None:
        data = NamedSharding(mesh, P(data_axis))

        def train_step_sharded(state, wire, offsets, step_idx, labels, valid, class_weights):
            labels = jax.lax.with_sharding_constraint(labels, data)
            valid = jax.lax.with_sharding_constraint(valid, data)
            return train_step(
                state, wire, offsets, step_idx, labels, valid, class_weights
            )

        return jax.jit(train_step_sharded, donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,))


def _make_resident_gather(mesh: Optional[Mesh], data_axis: str):
    """fn(resident: dict of FlatRows/(N,) device arrays, indices (B,)
    int32) → dict of DENSE (B, …) batch leaves, all on device.

    Resident pixels arrive as data.resident.FlatRows — flat (N, K) rows,
    because a top-level (N, T, H, W, 3) array pays a 42.7× TPU layout
    padding on its 3-wide lane dim — and are reshaped to dense rows AFTER
    the gather, inside the jit region.

    mesh=None: one global jnp.take.  With a mesh: each device gathers rows
    from ITS OWN shard locally under shard_map — `indices` carry per-shard
    LOCAL row numbers laid out shard-block-major (exactly the layout
    data.resident.ResidentClips.batches emits), so no resident bytes ever
    cross devices."""
    from ..data.resident import FlatRows

    def _densify(tree):
        return jax.tree.map(
            lambda x: x.densify() if isinstance(x, FlatRows) else x,
            tree,
            is_leaf=lambda x: isinstance(x, FlatRows),
        )

    if mesh is None:

        def gather(resident, indices):
            dense = jax.tree.map(lambda a: jnp.take(a, indices, axis=0), resident)
            return _densify(dense)

        return gather

    try:
        from jax import shard_map  # jax ≥ 0.7 public API
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def _local(resident, idx):
        return _densify(jax.tree.map(lambda a: a[idx], resident))

    return shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis)),
        out_specs=P(data_axis),
    )


def make_resident_train_step(
    bundle: ModelBundle,
    tx: optax.GradientTransformation,
    out_hw: Tuple[int, int],
    augment: bool,
    augment_p: float = 0.75,
    l2_weight: float = 0.0,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    input_scale: float = 1.0,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
    flow_from_augmented: bool = False,
):
    """Train step over an HBM-RESIDENT dataset (data.resident.ResidentClips):
    fn(state, batch, class_weights) with batch = {"resident": {name → (N, …)
    device array, incl. "label"}, "indices": (B,) int32, "valid": (B,) bool}.

    The staged pixels were uploaded ONCE (ResidentClips); every step gathers
    its batch rows on device and runs the SAME dense body as make_train_step
    — loss/grads/update match make_train_step on the gathered batch exactly
    (test_resident.py).  After the one-time upload, epochs cost ZERO
    host→device pixel bytes: the host ships int32 indices only.  This
    replaces the reference's per-epoch decode+feed hot loop
    (train.py:257-269) whenever the staged dataset fits in device memory
    (sharded over the data mesh axis when given).  Works for every pipeline
    mode the dense step supports: rgb, precomputed TV-L1 flow ("flow"
    resident array), and on-device Farnebäck ("gray"/"gray_next")."""
    body = _make_dense_train_body(
        bundle, tx, out_hw, augment, augment_p, l2_weight, input_scale,
        flow_fast_warp, flow_params, flow_from_augmented,
    )
    gather = _make_resident_gather(mesh, data_axis)

    def train_step(state: TrainState, batch, class_weights):
        dense = gather(batch["resident"], batch["indices"])
        dense["valid"] = batch["valid"]
        return body(state, dense, class_weights)

    if mesh is not None:
        data = NamedSharding(mesh, P(data_axis))

        def train_step_sharded(state, batch, class_weights):
            batch = dict(batch)
            batch["indices"] = jax.lax.with_sharding_constraint(
                batch["indices"], data
            )
            batch["valid"] = jax.lax.with_sharding_constraint(batch["valid"], data)
            return train_step(state, batch, class_weights)

        return jax.jit(train_step_sharded, donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,))


def make_resident_eval_step(
    bundle: ModelBundle,
    out_hw: Tuple[int, int],
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    input_scale: float = 1.0,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
):
    """Eval twin of make_resident_train_step: fn(variables, batch) over a
    ResidentClips batch — device-side gather then the SAME body as
    make_eval_step.  Feed evaluate_model(..., eval_step=...) with a
    ResidentClips as the pipeline."""
    body = _make_dense_eval_body(
        bundle, out_hw, input_scale, flow_fast_warp, flow_params
    )
    gather = _make_resident_gather(mesh, data_axis)

    def eval_step(variables, batch):
        dense = gather(batch["resident"], batch["indices"])
        dense["valid"] = batch["valid"]
        return body(variables, dense)

    if mesh is not None:
        data = NamedSharding(mesh, P(data_axis))

        def eval_step_sharded(variables, batch):
            batch = dict(batch)
            batch["indices"] = jax.lax.with_sharding_constraint(
                batch["indices"], data
            )
            batch["valid"] = jax.lax.with_sharding_constraint(batch["valid"], data)
            return eval_step(variables, batch)

        return jax.jit(eval_step_sharded)
    return jax.jit(eval_step)


def _make_dense_eval_body(
    bundle: ModelBundle,
    out_hw: Tuple[int, int],
    input_scale: float,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
):
    """The unjitted dense-batch eval body shared by make_eval_step and
    make_resident_eval_step."""
    two_stream = bundle.two_stream

    def eval_step(variables, batch):
        inputs = _preprocess(
            batch, None, out_hw, False, 0.0, two_stream, input_scale,
            flow_fast_warp, flow_params,
        )
        labels = batch["label"].astype(jnp.int32)
        mask = batch["valid"].astype(jnp.float32)
        logits = bundle.apply(variables, inputs, train=False)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss_sum = jnp.sum(ce * mask)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask)
        probs = jax.nn.softmax(logits, -1)
        return {
            "loss_sum": loss_sum,
            "correct": correct,
            "count": jnp.sum(mask),
            "probs": probs,
        }

    return eval_step


def make_eval_step(
    bundle: ModelBundle,
    out_hw: Tuple[int, int],
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    input_scale: float = 1.0,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
):
    eval_step = _make_dense_eval_body(
        bundle, out_hw, input_scale, flow_fast_warp, flow_params
    )

    if mesh is not None:
        data = NamedSharding(mesh, P(data_axis))
        def eval_step_sharded(variables, batch):
            batch = {
                k: jax.lax.with_sharding_constraint(v, data)
                for k, v in batch.items()
            }
            return eval_step(variables, batch)

        return jax.jit(eval_step_sharded)
    return jax.jit(eval_step)


def evaluate_model(
    bundle: ModelBundle,
    variables: Dict,
    pipeline,
    out_hw: Tuple[int, int],
    mesh: Optional[Mesh] = None,
    collect_probs: bool = False,
    input_scale: float = 1.0,
    eval_step=None,
) -> Dict[str, Any]:
    """Masked-accurate eval over a BatchPipeline (reference evaluate(),
    train.py:1925-1971 — but batched instead of batch_size=1).

    Pass `eval_step` (a make_eval_step result) to reuse one traced/compiled
    step across calls — `fit` does this so the val eval compiles once per
    fit, not once per epoch."""
    step = eval_step if eval_step is not None else make_eval_step(
        bundle, out_hw, mesh, input_scale=input_scale
    )
    loss_sum = 0.0
    correct = 0.0
    count = 0.0
    probs_all = [] if collect_probs else None
    ids_all = [] if collect_probs else None
    from ..data.pipeline import prefetch_batches

    for batch in prefetch_batches(pipeline, epoch=0):
        out = step(variables, batch)
        loss_sum += float(out["loss_sum"])
        correct += float(out["correct"])
        count += float(out["count"])
        if collect_probs:
            valid = np.asarray(batch["valid"])
            probs_all.append(np.asarray(out["probs"])[valid])
            if "index" in batch:
                ids_all.append(np.asarray(batch["index"])[valid])
    res = {
        "loss": loss_sum / max(count, 1.0),
        "accuracy": correct / max(count, 1.0),
        "count": int(count),
    }
    if collect_probs:
        probs = np.concatenate(probs_all, axis=0)
        if ids_all and len(ids_all) == len(probs_all):
            # Restore dataset (clip-id) order — a mesh-sharded
            # ResidentClips yields rows shard-interleaved, not in df order.
            probs = probs[np.argsort(np.concatenate(ids_all), kind="stable")]
        res["probs"] = probs
    return res


def fit(
    bundle: ModelBundle,
    train_pipeline,
    val_pipeline,
    *,
    epochs: int,
    seed: int = 0,
    augment: bool = False,
    augment_p: float = 0.75,
    balanced_classes: bool = False,
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
    lr_policy: Optional[LRPolicy] = None,
    early_stopping_patience: int = 100,
    initial_variables: Optional[Dict] = None,
    verbose: bool = False,
    input_scale: float = 1.0,
    optimizer: Optional[optax.GradientTransformation] = None,
    metrics_logger=None,
    save_full_every: int = 0,
    resume_full: bool = False,
    train_step=None,
    eval_step=None,
    flow_from_augmented: bool = False,
    flow_params: Optional[dict] = None,
) -> Dict[str, Any]:
    """Epoch loop with the reference's callback semantics.  Returns
    {'history': {...}, 'state': final TrainState, 'best_val_loss': float}.

    train_step/eval_step: prebuilt jitted steps (make_train_step /
    make_eval_step) to reuse across fits — ensemble members share one
    architecture and one set of shapes, so rebuilding the steps per
    member recompiles the whole model k·(k−1) times for nothing (on the
    axon relay that is minutes per compile).  A supplied train_step MUST
    have been built with the same optimizer instance passed as
    `optimizer` (the step closes over it)."""
    import json

    from .checkpoints import (  # lazy
        best_exists,
        full_exists,
        restore_best,
        restore_full,
        save_best,
        save_full,
    )

    out_hw = (bundle.clip.height, bundle.clip.width)
    policy = lr_policy or lr_policy_for(bundle.model_type)
    tx = optimizer or make_optimizer(bundle.model_type, policy.initial_lr)
    l2w = R3D_L2_WEIGHT if bundle.model_type.startswith("R3D") else 0.0

    rng = jax.random.key(seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = initial_variables or bundle.init(init_rng, batch_size=1)
    state = TrainState.create(variables, tx, state_rng)

    # Warm resume from an existing best checkpoint (train.py:1887-1890).
    if checkpoint_dir and best_exists(checkpoint_dir):
        best_vars = restore_best(checkpoint_dir, state.variables())
        state = state.replace(
            params=best_vars["params"],
            batch_stats=best_vars.get("batch_stats", state.batch_stats),
        )

    if balanced_classes:
        from ..data.pipeline import class_weights_balanced

        labels = train_pipeline.df["class"].astype(int).values
        cw = jnp.asarray(class_weights_balanced(labels, bundle.num_classes))
    else:
        cw = jnp.ones((bundle.num_classes,), jnp.float32)

    if train_step is None:
        train_step = make_train_step(
            bundle, tx, out_hw, augment, augment_p, l2w, mesh,
            input_scale=input_scale, flow_from_augmented=flow_from_augmented,
            flow_params=flow_params,
        )
    # One jitted eval step for the whole fit: rebuilding it per epoch would
    # retrace (and, on TPU backends without a persistent compile cache,
    # recompile) the full forward every epoch of the hottest loop.
    if eval_step is None:
        eval_step = make_eval_step(
            bundle, out_hw, mesh, input_scale=input_scale,
            flow_params=flow_params,
        )
    early = EarlyStopping(patience=early_stopping_patience)
    history = {"loss": [], "accuracy": [], "val_loss": [], "val_accuracy": []}
    best_val = math.inf
    lr = policy.initial_lr
    start_epoch = 0

    # Exact resume: full TrainState (params+opt+step+PRNG) + loop metadata —
    # the reference could only warm-start weights (train.py:1887-1890).
    meta_path = (
        os.path.join(checkpoint_dir, "fit_meta.json") if checkpoint_dir else None
    )
    if resume_full and checkpoint_dir and full_exists(checkpoint_dir):
        state = restore_full(checkpoint_dir, state)
        if meta_path and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            start_epoch = int(meta["epoch"]) + 1
            lr = float(meta["lr"])
            best_val = float(meta["best_val"])
            history = meta["history"]

    for epoch in range(start_epoch, epochs):
        lr = policy.epoch_begin_lr(epoch, lr)
        if hasattr(state.opt_state, "hyperparams"):
            state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

        from ..data.pipeline import prefetch_batches

        losses, accs = [], []
        for batch in prefetch_batches(train_pipeline, epoch=epoch):
            state, metrics = train_step(state, batch, cw)
            losses.append(metrics["loss"])
            accs.append(metrics["accuracy"])
        epoch_loss = float(jnp.mean(jnp.stack(losses)))
        epoch_acc = float(jnp.mean(jnp.stack(accs)))

        if not math.isfinite(epoch_loss):  # TerminateOnNaN, actually wired
            history["loss"].append(epoch_loss)
            break

        val = evaluate_model(
            bundle, state.variables(), val_pipeline, out_hw, mesh,
            input_scale=input_scale, eval_step=eval_step,
        )
        history["loss"].append(epoch_loss)
        history["accuracy"].append(epoch_acc)
        history["val_loss"].append(val["loss"])
        history["val_accuracy"].append(val["accuracy"])
        if verbose:
            print(
                f"epoch {epoch}: loss {epoch_loss:.4f} acc {epoch_acc:.3f} "
                f"val_loss {val['loss']:.4f} val_acc {val['accuracy']:.3f} lr {lr:.2e}"
            )
        if metrics_logger is not None:
            metrics_logger.log(
                "epoch",
                epoch=epoch,
                loss=epoch_loss,
                accuracy=epoch_acc,
                val_loss=val["loss"],
                val_accuracy=val["accuracy"],
                lr=lr,
                model_type=bundle.model_type,
            )

        if val["loss"] < best_val:  # best-only checkpoint (train.py:1850-1853)
            best_val = val["loss"]
            if checkpoint_dir:
                save_best(checkpoint_dir, state.variables())

        lr = policy.epoch_end_lr(val["loss"], lr)

        if (
            save_full_every
            and checkpoint_dir
            and (epoch + 1) % save_full_every == 0
        ):
            save_full(checkpoint_dir, state)
            with open(meta_path, "w") as f:
                json.dump(
                    {"epoch": epoch, "lr": lr, "best_val": best_val,
                     "history": history},
                    f,
                )

        if early.update(val["loss"]):
            break

    return {"history": history, "state": state, "best_val_loss": best_val}


def store_history(history: Dict, path: str) -> None:
    """Persist val-loss history for VALIDATION_ERROR_INVERSE fusion
    (reference store_history train.py:63-82 wrote `*_validation_losses.npy`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(history["val_loss"], np.float32))
