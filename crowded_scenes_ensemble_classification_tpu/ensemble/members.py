"""Member-parallel ensemble inference: stacked params + vmap over a
`member` mesh axis.

The reference ran each ensemble member's predict_generator sequentially with
batch_size=1 (evaluate_ensemble.py:1032-1063).  Here, all members of one
architecture are a SINGLE stacked pytree; `jax.vmap` maps the forward over
the member axis, so one jit region computes every member's softmax for a
batch.  On a mesh with a `member` axis the stacked params are sharded over
it — member parallelism becomes SPMD instead of a Slurm fan-out
(SURVEY.md §2.2).

Heterogeneous ensembles (different architectures) can't share one vmap —
members are grouped by architecture, vmapped within each group, and the
(M, N, C) probability tensors concatenated (SURVEY.md §7.3.5).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.registry import ModelBundle
from ..ops.augment import identity_resize_batch


def stack_variables(variables_list: Sequence[Dict]) -> Dict:
    """Stack M same-architecture variable pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *variables_list)


def shard_stacked(stacked: Dict, mesh: Mesh, member_axis: str = "member") -> Dict:
    sharding = NamedSharding(mesh, P(member_axis))
    return jax.device_put(stacked, sharding)


def prepare_member_inputs(
    batch: Dict,
    out_hw: Tuple[int, int],
    two_stream: bool,
    input_scale: float = 1.0,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
) -> Dict:
    """The member-forward input preprocessing — resize to the model hw,
    input_scale (mirroring train.engine._preprocess: rgb and precomputed
    TVL1 flow are 0-255 imagery and scale; on-device Farnebäck flow is
    displacement and does NOT), and on-device Farnebäck from staged gray
    pairs when the batch carries no precomputed flow.  Shared by
    inference (make_member_forward) and int8 calibration
    (calibrate_members) so calibrated scales see EXACTLY the inference
    activations."""
    inputs = {
        "rgb": identity_resize_batch(batch["rgb"].astype(jnp.float32), out_hw)
        * input_scale
    }
    if two_stream:
        if "flow" in batch:
            inputs["flow"] = (
                identity_resize_batch(batch["flow"].astype(jnp.float32), out_hw)
                * input_scale
            )
        else:
            # Gray pairs are first scaled to the reference's flow
            # resolution (max-dim 224, train.py:304-307) so flow values
            # come out in the reference's pixel units; flat-batch form —
            # nested vmap halves flow throughput
            # (farneback.farneback_flow_batch)
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
            flow_hw = reference_flow_hw(gray4.shape[2:4])
            if flow_hw != tuple(gray4.shape[2:4]):
                gray4 = identity_resize_batch(gray4, flow_hw)
                gray_next4 = identity_resize_batch(gray_next4, flow_hw)
            flows = farneback_flow_batch(gray4[..., 0], gray_next4[..., 0], **kw)
            if flow_hw != tuple(out_hw):
                flows = identity_resize_batch(flows, out_hw)
            inputs["flow"] = flows
    return inputs


def calibrate_members(
    calib_bundle: ModelBundle,
    variables_list: Sequence[Dict],
    pipeline,
    num_batches: int = 2,
    input_scale: float = 1.0,
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
) -> List[Dict]:
    """Static-int8 calibration for every member (VERDICT r3 #2): runs the
    first `num_batches` of `pipeline` through a quant='calib' bundle with
    the SAME preprocessing as member inference, recording per-layer
    activation abs-max, then pre-bakes int8 weights
    (models.quantize.quantize_variables).  Returns the per-member
    variables ready for a quant='static' bundle.

    I3D-family members calibrate through the PRESTAGED stem form —
    member_probabilities always shares the s2d stem staging, and the
    prestaged stem records its scale at its own scope."""
    from ..data.pipeline import prefetch_batches
    from ..models.common import s2d_stem_stage
    from ..models.quantize import quantize_variables

    out_hw = (calib_bundle.clip.height, calib_bundle.clip.width)
    two_stream = calib_bundle.two_stream
    share = calib_bundle.model_type in ("I3D", "TWOSTREAM_I3D")
    module = (
        calib_bundle.module.clone(stem_prestaged=True)
        if share
        else calib_bundle.module
    )

    def _args(batch):
        inputs = prepare_member_inputs(
            batch, out_hw, two_stream, input_scale, flow_fast_warp, flow_params
        )
        if share and two_stream:
            return (s2d_stem_stage(inputs["rgb"]), s2d_stem_stage(inputs["flow"]))
        if share:
            return (s2d_stem_stage(inputs["rgb"]),)
        if two_stream:
            return (inputs["rgb"], inputs["flow"])
        return (inputs["rgb"],)

    @jax.jit
    def _calib_step(vs, *args):
        # jitted: an eager apply would be thousands of per-op dispatches
        # through the TPU relay
        _, mut = module.apply(vs, *args, train=False, mutable=["qstats"])
        return mut

    batches = []
    for batch in prefetch_batches(pipeline, epoch=0):
        batches.append(batch)
        if len(batches) >= num_batches:
            break
    if not batches:
        raise ValueError("calibrate_members: empty pipeline")

    # preprocessing (resize, scaling, on-device flow) is member-
    # independent — compute it ONCE per batch, not once per member
    arg_sets = [_args(batch) for batch in batches]
    out = []
    for v in variables_list:
        vs = dict(v)
        for args in arg_sets:
            vs = {**vs, **_calib_step(vs, *args)}
        out.append(quantize_variables(vs))
    return out


def make_member_forward(
    bundle: ModelBundle,
    out_hw: Tuple[int, int],
    mesh: Optional[Mesh] = None,
    member_axis: str = "member",
    data_axis: str = "data",
    flow_fast_warp: bool = False,
    flow_params: Optional[dict] = None,
    share_stem_staging: bool = False,
    input_scale: float = 1.0,
):
    """Returns fn(stacked_vars, batch) → (M, B, C) softmax probabilities.

    flow_params forwards extra kwargs to farneback_flow_pair — e.g.
    `flow.farneback.TURBO_PARAMS` for the EPE-gated adaptive schedule.

    input_scale mirrors train.engine._preprocess exactly: rgb (and
    precomputed TVL1 flow, which is 0-255 imagery) are scaled; on-device
    Farnebäck flow is NOT (it is displacement, not pixels).  Members
    must be evaluated at the scale they trained with.

    share_stem_staging=True (I3D / TWOSTREAM_I3D): the stem's
    space-to-depth staging (models.common.s2d_stem_stage) is computed ONCE
    per batch and shared by every member — 1.2× the 4-member stem on v5e
    (the per-member weight rearrangement is free; parameter trees are
    unchanged).  For TwoStream both trunks' stagings (rgb AND flow) are
    shared, amortizing 2·M stem stagings into 2."""
    two_stream = bundle.two_stream
    prestaged_module = None
    if share_stem_staging:
        if bundle.model_type not in ("I3D", "TWOSTREAM_I3D"):
            raise ValueError("share_stem_staging supports I3D-family models")
        prestaged_module = bundle.module.clone(stem_prestaged=True)

    def forward(stacked_vars, batch):
        inputs = prepare_member_inputs(
            batch, out_hw, two_stream, input_scale, flow_fast_warp, flow_params
        )

        if prestaged_module is not None and two_stream:
            from ..models.common import s2d_stem_stage

            xs_rgb = s2d_stem_stage(inputs["rgb"])
            xs_flow = s2d_stem_stage(inputs["flow"])

            def one_member(variables):
                logits = prestaged_module.apply(
                    variables, xs_rgb, xs_flow, train=False
                )
                return jax.nn.softmax(logits, axis=-1)

        elif prestaged_module is not None:
            from ..models.common import s2d_stem_stage

            xs = s2d_stem_stage(inputs["rgb"])

            def one_member(variables):
                logits = prestaged_module.apply(variables, xs, train=False)
                return jax.nn.softmax(logits, axis=-1)

        else:

            def one_member(variables):
                logits = bundle.apply(variables, inputs, train=False)
                return jax.nn.softmax(logits, axis=-1)

        if mesh is None:
            # single-chip: sequential members quarter peak activation
            # memory — measured +11% over vmap at B=48 and unlocks B=96
            # (bench.py notes); on a member-sharded mesh vmap is the
            # SPMD-parallel form.
            return jax.lax.map(one_member, stacked_vars)
        return jax.vmap(one_member)(stacked_vars)

    if mesh is not None:
        member = NamedSharding(mesh, P(member_axis))
        data = NamedSharding(mesh, P(None, data_axis))  # probs (M, B, C)
        batch_in = NamedSharding(mesh, P(data_axis))

        def forward_sharded(stacked_vars, batch):
            stacked_vars = jax.lax.with_sharding_constraint(
                stacked_vars, member
            )
            batch = {
                k: jax.lax.with_sharding_constraint(v, batch_in)
                for k, v in batch.items()
            }
            return jax.lax.with_sharding_constraint(
                forward(stacked_vars, batch), data
            )

        return jax.jit(forward_sharded)
    return jax.jit(forward)


def get_member_forward(
    bundle: ModelBundle,
    out_hw: Tuple[int, int],
    mesh: Optional[Mesh] = None,
    **kwargs,
):
    """make_member_forward memoized on the bundle: repeated callers
    (probability caching loops over k test folds with identical shapes)
    reuse ONE jitted forward instead of recompiling per fold."""
    cache = bundle.__dict__.setdefault("_member_forward_cache", {})
    fp = kwargs.get("flow_params")
    try:
        key = (
            tuple(out_hw),
            mesh,
            kwargs.get("member_axis", "member"),
            kwargs.get("data_axis", "data"),
            kwargs.get("flow_fast_warp", False),
            tuple(sorted(fp.items())) if fp else None,
            kwargs.get("share_stem_staging", False),
            float(kwargs.get("input_scale", 1.0)),
        )
        if key not in cache:
            cache[key] = make_member_forward(bundle, out_hw, mesh, **kwargs)
        return cache[key]
    except TypeError:  # unhashable key parts — fall back to no memoization
        return make_member_forward(bundle, out_hw, mesh, **kwargs)


def member_probabilities(
    bundle: ModelBundle,
    variables_list: Sequence[Dict],
    pipeline,
    mesh: Optional[Mesh] = None,
    input_scale: float = 1.0,
    flow_params: Optional[dict] = None,
) -> np.ndarray:
    """Run every member over the whole pipeline → (M, N, C) float32, in
    dataset order (the probability-store tensor; reference
    store_probabilities evaluate_ensemble.py:1002-1109).  input_scale must
    be the scale the members trained with (see make_member_forward);
    flow_params likewise must be the Farnebäck schedule they trained with
    (flow.farneback.flow_schedule_params(config.flow_schedule))."""
    out_hw = (bundle.clip.height, bundle.clip.width)
    stacked = stack_variables(variables_list)
    # I3D-family: compute the s2d stem staging once per batch, shared by
    # every member (both trunks for TwoStream) — parity-tested to 2e-5.
    share = bundle.model_type in ("I3D", "TWOSTREAM_I3D")
    if mesh is not None and "member" in mesh.axis_names and (
        len(variables_list) % mesh.shape["member"] == 0
    ):
        stacked = shard_stacked(stacked, mesh)
        forward = get_member_forward(
            bundle, out_hw, mesh, share_stem_staging=share,
            input_scale=input_scale, flow_params=flow_params,
        )
    else:
        forward = get_member_forward(
            bundle, out_hw, share_stem_staging=share, input_scale=input_scale,
            flow_params=flow_params,
        )

    from ..data.pipeline import prefetch_batches

    chunks: List[np.ndarray] = []
    for batch in prefetch_batches(pipeline, epoch=0):
        probs = np.asarray(forward(stacked, batch))  # (M, B, C)
        valid = np.asarray(batch["valid"])
        chunks.append(probs[:, valid])
    return np.concatenate(chunks, axis=1)
