"""Member-parallel TRAINING: all same-architecture ensemble members train
simultaneously in one jit region.

The reference trained its k·(k−1) members as independent Slurm jobs
(launch_train_ensemble.py:144-158).  Here the members of one test fold are
a STACKED TrainState (leading member axis) and the update is vmapped over
it — each member consumes its own batch (different train splits), so the
stacked batch is (M, B, ...).  On a (member, data) mesh the member axis
shards across devices and the fan-out becomes SPMD: one chip trains all
members with amortized overheads, a pod slice trains them truly in
parallel, with NO inter-member communication (matching the reference's
independence).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import l2_param_penalty
from ..models.registry import ModelBundle
from ..ops.augment import crowd11_augment_batch, identity_resize_batch
from .state import TrainState


def stack_states(states: Sequence[TrainState]) -> TrainState:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(stacked: TrainState, n: int) -> list:
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)
    ]


def make_multi_member_train_step(
    bundle: ModelBundle,
    tx: optax.GradientTransformation,
    out_hw: Tuple[int, int],
    augment: bool,
    augment_p: float = 0.75,
    l2_weight: float = 0.0,
    input_scale: float = 1.0,
    mesh: Optional[Mesh] = None,
    member_axis: str = "member",
    data_axis: str = "data",
):
    """step(stacked_states, stacked_batch, class_weights) →
    (stacked_states, per-member metrics).  stacked_batch leaves have a
    leading member dim: rgb (M, B, T, H, W, C), label (M, B), valid (M, B)."""

    def member_update(state: TrainState, batch, class_weights):
        rng = jax.random.fold_in(state.rng, state.step)
        rng_aug, rng_drop = jax.random.split(rng)
        rgb = batch["rgb"].astype(jnp.float32)
        if augment:
            rgb = crowd11_augment_batch(rgb, rng_aug, out_hw, p=augment_p)
        else:
            rgb = identity_resize_batch(rgb, out_hw)
        inputs = {"rgb": rgb * input_scale}
        labels = batch["label"].astype(jnp.int32)
        mask = batch["valid"].astype(jnp.float32)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"] if state.batch_stats else []
            logits, new_model_state = bundle.apply(
                variables, inputs, train=True,
                rngs={"dropout": rng_drop}, mutable=mutable,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            w = mask * class_weights[labels]
            loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
            if l2_weight > 0.0:
                loss = loss + l2_param_penalty(params, l2_weight)
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )
            return loss, (acc, new_model_state.get("batch_stats", state.batch_stats))

        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "accuracy": acc}

    vstep = jax.vmap(member_update, in_axes=(0, 0, None))

    if mesh is not None:
        member = NamedSharding(mesh, P(member_axis))
        md = NamedSharding(mesh, P(member_axis, data_axis))

        def sharded(states, batches, cw):
            states = jax.lax.with_sharding_constraint(states, member)
            batches = {
                k: jax.lax.with_sharding_constraint(v, md)
                for k, v in batches.items()
            }
            return vstep(states, batches, cw)

        return jax.jit(sharded, donate_argnums=(0,))
    return jax.jit(vstep, donate_argnums=(0,))


def zip_member_batches(batch_iters) -> "zip":
    """Zip per-member batch iterators into stacked (M, B, ...) batches.
    Stops at the shortest member epoch (members have equal-length train
    splits in the k-fold design, so nothing is dropped in practice)."""

    def stack(batches):
        keys = set(batches[0]) & set.intersection(*(set(b) for b in batches))
        return {k: np.stack([b[k] for b in batches]) for k in keys}

    for batches in zip(*batch_iters):
        yield stack(batches)
