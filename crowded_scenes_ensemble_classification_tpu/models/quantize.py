"""Static int8 calibration for the model zoo (VERDICT r3 #2).

Round 3 measured the DYNAMIC whole-model int8 path losing to bf16
(128.4 vs 214.0 clips/s at B=48): the per-layer activation abs-max
reduction, round/cast pass, and f32 dequant write are three extra HBM
passes per activation tensor.  The static path removes the reduction and
the weight requant entirely:

1. build the model with quant='calib' and run a few representative
   batches through `calibrate` — each QuantConv records its running
   activation abs-max into the 'qstats' collection while computing the
   EXACT f32 forward;
2. `quantize_variables` pre-bakes every QuantConv kernel to int8 once
   (per-output-channel symmetric scales) into the 'qparams' collection;
3. build the model with quant='static' and apply with the augmented
   variables — each conv consumes the calibrated scale (out-of-range
   activations saturate at ±127, the standard static-quant semantics)
   and the pre-baked int8 weights
   (models.common.static_quant_conv_general).

The 'params' tree is untouched in every mode, so the same converted
reference checkpoints (reference conv3d_bn train.py:615-670 and the
C3D/R3D convs, train.py:1224-1559) load across f32/bf16/dynamic/static.
Accuracy is gated in tests/test_quant.py (static-vs-f32 softmax drift +
top-1 agreement on a realistic reference-layout checkpoint).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax.numpy as jnp

from .common import weight_qparams

# A MIXED int8/bf16 block policy for the I3D family (VERDICT r4 item 4):
# int8 only at the three stem convs (large spatial extents) and the
# largest-channel inception blocks (480-832 input channels).
#
# MEASURED VERDICT (round-5 per-site A/B, `perf_probe_quant --ab`, v5e
# B=96, full table in NEXT.md): whole-model static int8 (quant_blocks
# =None) is the FASTEST policy — 94.46 ms/member vs 101.33 mixed vs
# 109.63 bf16.  Per-site marginals are non-additive: most single sites
# LOSE in isolation (Mixed_4b/4c/4e +3.7..+5.6 ms each) because a lone
# int8 island pays bf16↔int8 boundary conversions that XLA only fuses
# away when its neighbours are quantized too.  So this policy is NOT a
# throughput default (production and bench default to quantizing
# everywhere); it remains available for ACCURACY-driven partial
# quantization via --quant-blocks mixed.
MIXED_INT8_POLICY: Tuple[str, ...] = (
    "Conv3d_1a_7x7",
    "Conv3d_2b_1x1",
    "Conv3d_2c_3x3",
    "Mixed_4f",
    "Mixed_5b",
    "Mixed_5c",
)


def resolve_quant_blocks(spec) -> Optional[Tuple[str, ...]]:
    """Normalize a quant-block policy: None → None (quantize everywhere),
    'mixed' → MIXED_INT8_POLICY, 'all' → None, a comma string or iterable
    of site names → sorted tuple.  Site names are the I3D stem convs
    ('Conv3d_1a_7x7', 'Conv3d_2b_1x1', 'Conv3d_2c_3x3') and the nine
    'Mixed_*' blocks (models/i3d.py I3DTrunk.quant_blocks)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        if spec == "mixed":
            return MIXED_INT8_POLICY
        if spec == "all":
            return None
        spec = [s.strip() for s in spec.split(",") if s.strip()]
    return tuple(sorted(spec))


def calibrate(module, variables: Dict, batches: Iterable, **apply_kwargs) -> Dict:
    """Run `batches` through a quant='calib' module, returning `variables`
    augmented with the 'qstats' collection (running per-layer activation
    abs-max over all batches).

    `variables` may come straight from a bf16/f32 checkpoint (no qstats) —
    the first apply creates the collection.  For TwoStream modules pass
    each batch as a (rgb, flow) tuple; extra apply kwargs (e.g. train=False)
    forward to module.apply."""
    vs = dict(variables)
    for batch in batches:
        args = batch if isinstance(batch, tuple) else (batch,)
        _, mutated = module.apply(vs, *args, mutable=["qstats"], **apply_kwargs)
        vs = {**vs, **mutated}
    if "qstats" not in vs:
        raise ValueError(
            "calibrate ran zero batches or the module has no QuantConv "
            "(was it built with quant='calib'?)"
        )
    return vs


def quantize_variables(variables: Dict) -> Dict:
    """Pre-bake int8 weights for every calibrated QuantConv: adds the
    'qparams' collection (k8 int8 + per-output-channel scales sw) beside
    the untouched 'params'/'qstats'.  Modules whose quantized kernel is
    DERIVED in-graph (the prestaged s2d stem) have qstats but no direct
    'kernel' sibling — they keep quantizing their transformed kernel
    in-graph and get no qparams entry."""
    if "qstats" not in variables:
        raise ValueError("quantize_variables needs calibrated 'qstats' "
                         "(run models.quantize.calibrate first)")

    def _rec(params: Any, stats: Any) -> Dict:
        if isinstance(stats, dict) and "act_absmax" in stats:
            if isinstance(params, dict) and "kernel" in params:
                k8, sw = weight_qparams(jnp.asarray(params["kernel"]))
                return {"k8": k8, "sw": sw}
            return {}
        return {
            k: _rec(params[k] if isinstance(params, dict) else {}, v)
            for k, v in stats.items()
            if isinstance(v, dict)
        }

    qparams = _rec(variables.get("params", {}), variables["qstats"])
    return {**variables, "qparams": qparams}


def calibration_summary(variables: Dict) -> Dict[str, float]:
    """Flat {module/path: act_absmax} view of the calibrated scales —
    diagnostic for spotting saturated/dead layers before deployment."""
    out: Dict[str, float] = {}

    def _rec(node: Any, path: str) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "act_absmax":
                    out[path] = float(v)
                else:
                    _rec(v, f"{path}/{k}" if path else k)

    _rec(variables.get("qstats", {}), "")
    return out
