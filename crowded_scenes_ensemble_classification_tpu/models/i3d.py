"""Inflated Inception-v1 (I3D, Carreira & Zisserman 2017) in Flax.

Behavioural spec from the reference `Inception_architecture`
(train.py:1013-1219) and `Inception_Inflated3d` (train.py:673-843):

- stem: 7³/2 conv → (1,3,3)/(1,2,2) maxpool → 1³ conv → 3³ conv → maxpool
- 9 inception blocks Mixed_3b..Mixed_5c, each 4 branches concatenated on C
- every conv is Conv3D(no bias) + BatchNorm(scale=False) + ReLU
  (reference conv3d_bn train.py:615-670)
- feature head (the path used for Crowd-11, include_top=False at
  train.py:1575-1581): AvgPool3D((2,h,w), stride 1, valid)
- classifier head (include_top=True, train.py:1196-1213): avgpool (2,7,7) →
  dropout → 1×1×1 conv(classes, bias) → mean over time → logits
- the Crowd-11 model appends Flatten + Dense(classes, softmax)
  (train.py:824-841); here the Dense returns logits.

Canonical Crowd-11 input: 20×224×224×3 (train.py:1573-1581); the original
Kinetics geometry 64×224×224 also works (all shapes are static under jit).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (
    PrestagedS2DStemConvBN,
    ConvBN,
    PallasStemConvBN,
    S2DStemConvBN,
    avg_pool_3d,
    flatten,
    max_pool_3d,
)

@functools.lru_cache(maxsize=1)
def _default_platform() -> str:
    """Cached once per process — pool_impl='auto' must not re-query the
    device list on every trace (fragile under AOT / multi-backend)."""
    return jax.devices()[0].platform


# (b0_1x1, b1_1x1, b1_3x3, b2_1x1, b2_3x3, b3_pool_proj) per inception block.
INCEPTION_SPECS = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class InceptionBlock(nn.Module):
    """One Mixed_* block: 4 parallel branches concatenated on channels.

    pool_impl='pallas' routes the 3³/1 SAME maxpool branch through the
    Pallas DMA kernel (ops.pallas.maxpool) — TPU only.

    fuse_1x1=True runs the three 1×1×1 convs that read the block input
    (b0_1x1, b1_1x1, b2_1x1) as ONE conv whose kernel is their in-graph
    concatenation on the output-feature axis — exact same math and zero
    extra FLOPs, one MXU contraction instead of three narrow ones.
    Measured on v5e (round-4 same-process A/B, B=96 4-member forward)
    it is ~5% SLOWER than XLA's unfused lowering in both bf16 and
    static-int8 — XLA already fuses the three contractions' input reads,
    and the per-branch BN over misaligned channel slices breaks its
    epilogue fusion — so it ships default-OFF as an opt-in for hardware
    where the trade goes the other way.  Parameter tree is unchanged
    (models.common.ExternalConvBN keeps the canonical
    `<branch>/conv/kernel` + `<branch>/bn` paths), so checkpoints are
    interchangeable between fused and unfused graphs.

    fuse_1x1 composes with quant='static' (ExternalQuantConvBN): the int8
    kernels/scales of the three branches concatenate on the output-channel
    axis and the block input quantizes ONCE under their shared calibrated
    activation scale — bit-identical to the unfused static path because
    all three branches calibrate on the SAME input tensor (equal
    act_absmax stats; the fused graph takes their max, which only differs
    if variables were hand-edited).  'dynamic' and 'calib' quant modes
    stay unfused ('calib' must record per-branch stats at the canonical
    paths; 'dynamic' is a shipped negative result — see
    models.common.quant_conv_general)."""

    spec: Tuple[int, int, int, int, int, int]
    dtype: jnp.dtype = jnp.float32
    pool_impl: str = "auto"  # auto | xla | pallas
    quant: bool = False  # int8 conv contractions (inference only)
    fuse_1x1: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from .common import (
            ExternalConvBN,
            ExternalQuantConvBN,
            quant_mode,
            static_quant_conv_general,
        )

        b0_c, b1_r, b1_c, b2_r, b2_c, b3_c = self.spec
        cbn = lambda feats, kernel, name: ConvBN(
            feats, kernel, dtype=self.dtype, quant=self.quant, name=name
        )
        if self.fuse_1x1 and self.quant and quant_mode(self.quant) == "static":
            if train:
                raise ValueError("quant ConvBN is inference-only")
            cin = int(x.shape[-1])
            e0 = ExternalQuantConvBN(
                b0_c, (1, 1, 1), cin, dtype=self.dtype, name="b0_1x1"
            )
            e1 = ExternalQuantConvBN(
                b1_r, (1, 1, 1), cin, dtype=self.dtype, name="b1_1x1"
            )
            e2 = ExternalQuantConvBN(
                b2_r, (1, 1, 1), cin, dtype=self.dtype, name="b2_1x1"
            )
            states = [e.quant_state() for e in (e0, e1, e2)]
            k8 = jnp.concatenate([s[0] for s in states], -1)
            sw = jnp.concatenate([s[1] for s in states], -1)
            act = jnp.maximum(jnp.maximum(states[0][2], states[1][2]), states[2][2])
            red = static_quant_conv_general(
                x, k8, sw, act / 127.0, (1, 1, 1), "SAME"
            )
            branch_0 = e0(red[..., :b0_c], train)
            branch_1 = e1(red[..., b0_c : b0_c + b1_r], train)
            branch_2 = e2(red[..., b0_c + b1_r :], train)
        elif self.fuse_1x1 and not self.quant:
            cin = int(x.shape[-1])
            e0 = ExternalConvBN(b0_c, (1, 1, 1), cin, dtype=self.dtype, name="b0_1x1")
            e1 = ExternalConvBN(b1_r, (1, 1, 1), cin, dtype=self.dtype, name="b1_1x1")
            e2 = ExternalConvBN(b2_r, (1, 1, 1), cin, dtype=self.dtype, name="b2_1x1")
            kcat = jnp.concatenate(
                [e0.kernel_value(), e1.kernel_value(), e2.kernel_value()], -1
            )
            red = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kcat.astype(self.dtype),
                (1, 1, 1),
                "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            branch_0 = e0(red[..., :b0_c], train)
            branch_1 = e1(red[..., b0_c : b0_c + b1_r], train)
            branch_2 = e2(red[..., b0_c + b1_r :], train)
        else:
            branch_0 = cbn(b0_c, (1, 1, 1), "b0_1x1")(x, train)
            branch_1 = cbn(b1_r, (1, 1, 1), "b1_1x1")(x, train)
            branch_2 = cbn(b2_r, (1, 1, 1), "b2_1x1")(x, train)
        branch_1 = cbn(b1_c, (3, 3, 3), "b1_3x3")(branch_1, train)
        branch_2 = cbn(b2_c, (3, 3, 3), "b2_3x3")(branch_2, train)
        use_pallas = self.pool_impl == "pallas" or (
            self.pool_impl == "auto"
            and _default_platform() == "tpu"
            # measured on v5e: the pallas kernel wins at the 56² level
            # (1.75×) and loses at ≤28² where chunk overhead dominates
            and int(x.shape[2]) * int(x.shape[3]) >= 56 * 56
        )
        if use_pallas:
            from ..ops.pallas.maxpool import max_pool_3x3x3_same

            branch_3 = max_pool_3x3x3_same(x)
        else:
            branch_3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1), "SAME")
        branch_3 = cbn(b3_c, (1, 1, 1), "b3_1x1")(branch_3, train)
        return jnp.concatenate([branch_0, branch_1, branch_2, branch_3], axis=-1)


class I3DTrunk(nn.Module):
    """Stem + Mixed_3b..Mixed_5c.  Output: (N, T', H', W', 1024) features
    (pre-head).

    remat=True rematerializes each inception block on the backward pass
    (jax.checkpoint) — trades ~20% more FLOPs for a large activation-memory
    saving, enabling bigger per-chip batches when training at 224²."""

    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # remat_blocks: selective rematerialization — checkpoint ONLY the
    # named Mixed_* blocks (remat=True remats all nine).  The round-5
    # probe showed whole-trunk remat LOSES at every batch (recompute
    # FLOPs outweigh the memory win) while the backward's per-FLOP rate
    # degrades with batch (bwd/fwd 1.17→1.65 from B=32→96, HBM-pressure
    # shaped); rematting just the big-activation/cheap-FLOP early blocks
    # (Mixed_3b/3c at 56² × ≤480 ch) is the targeted version.
    remat_blocks: Optional[Tuple[str, ...]] = None
    # s2d_stem=True rewrites the 7³/2 stem as a space-to-depth conv —
    # bit-identical math (models.common.s2d_stem_conv); measured neutral on
    # v5e (XLA already tiles the stem well) — kept as an option.
    s2d_stem: bool = False
    pool_impl: str = "auto"
    # stem_impl: 'pallas' routes the 7³/2 stem through the Pallas
    # patch-matmul kernel (inference only — no backward defined); 'auto'
    # currently resolves to the canonical XLA conv — the v8 kernel variants
    # measure SLOWER than XLA so far (see NEXT.md stem campaign notes).
    stem_impl: str = "auto"
    # stem_prestaged=True: the input is ALREADY the s2d_stem_stage layout
    # (N, T, H/2+3, W/2+3, 4C) — computed once per batch by the caller and
    # shared across ensemble members (1.2× the 4-member stem on v5e; see
    # models.common.s2d_stem_stage).
    stem_prestaged: bool = False
    # quant=True runs every conv contraction in int8 on the MXU (2× the
    # bf16 rate on v5e) with per-output-channel weight scales + dynamic
    # per-tensor activation scales — inference only, identical parameter
    # tree (models.common.quant_conv_general).
    quant: bool = False
    # quant_blocks=None applies `quant` everywhere; a tuple of site names
    # (stem convs "Conv3d_1a_7x7"/"Conv3d_2b_1x1"/"Conv3d_2c_3x3" and the
    # 9 "Mixed_*" blocks) restricts int8 to those sites and keeps the
    # rest bf16 — the MIXED policy (VERDICT r4 item 4): XLA only issues
    # int8 MXU ops for the large-channel blocks; small-channel branch
    # convs stay conversion-bound and lose to bf16.  Calibrate with the
    # SAME quant_blocks so qstats exist exactly where the static path
    # reads them.
    quant_blocks: Optional[Tuple[str, ...]] = None
    # fuse_1x1=True fuses each block's three input 1×1×1 convs into ONE
    # conv (exact rewrite, same checkpoints — see InceptionBlock).
    fuse_1x1: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant and (self.remat or self.remat_blocks):
            # remat is a training feature; the quantized path is
            # inference-only and the remat block ctor bypasses the partial
            raise ValueError("quant=True is incompatible with remat")

        def site_quant(name: str):
            if self.quant_blocks is None or name in self.quant_blocks:
                return self.quant
            return False

        def block_cls(spec, dtype, name):
            if self.remat or (
                self.remat_blocks is not None and name in self.remat_blocks
            ):
                return functools.partial(
                    nn.remat(InceptionBlock, static_argnums=(2,)),
                    pool_impl=self.pool_impl,
                    fuse_1x1=self.fuse_1x1,
                )(spec, dtype=dtype, name=name)
            return InceptionBlock(
                spec,
                dtype=dtype,
                name=name,
                pool_impl=self.pool_impl,
                quant=site_quant(name),
                fuse_1x1=self.fuse_1x1,
            )
        x = x.astype(self.dtype)
        use_pallas_stem = self.stem_impl == "pallas" and not train
        if self.stem_prestaged:
            x = PrestagedS2DStemConvBN(
                64, dtype=self.dtype, quant=site_quant("Conv3d_1a_7x7"),
                name="Conv3d_1a_7x7",
            )(x, train)
        elif use_pallas_stem:
            x = PallasStemConvBN(64, dtype=self.dtype, name="Conv3d_1a_7x7")(x, train)
        elif self.s2d_stem:
            x = S2DStemConvBN(64, dtype=self.dtype, name="Conv3d_1a_7x7")(x, train)
        else:
            x = ConvBN(64, (7, 7, 7), strides=(2, 2, 2), dtype=self.dtype, quant=site_quant("Conv3d_1a_7x7"), name="Conv3d_1a_7x7")(x, train)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), "SAME")
        x = ConvBN(64, (1, 1, 1), dtype=self.dtype, quant=site_quant("Conv3d_2b_1x1"), name="Conv3d_2b_1x1")(x, train)
        x = ConvBN(192, (3, 3, 3), dtype=self.dtype, quant=site_quant("Conv3d_2c_3x3"), name="Conv3d_2c_3x3")(x, train)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2), "SAME")

        for name in ("Mixed_3b", "Mixed_3c"):
            x = block_cls(INCEPTION_SPECS[name], dtype=self.dtype, name=name)(x, train)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2), "SAME")
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = block_cls(INCEPTION_SPECS[name], dtype=self.dtype, name=name)(x, train)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), "SAME")
        for name in ("Mixed_5b", "Mixed_5c"):
            x = block_cls(INCEPTION_SPECS[name], dtype=self.dtype, name=name)(x, train)
        return x


def i3d_feature_head(x: jax.Array) -> jax.Array:
    """include_top=False head: AvgPool3D((2, h, w), stride 1, valid)
    (reference train.py:1214-1217)."""
    h, w = int(x.shape[2]), int(x.shape[3])
    return avg_pool_3d(x, (2, h, w), (1, 1, 1), "VALID")


class I3D(nn.Module):
    """Single-stream I3D classifier as used on Crowd-11: trunk →
    feature head → Flatten → Dense(num_classes) (reference
    train.py:824-841, include_top=False)."""

    num_classes: int = 11
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # selective remat of named Mixed_* blocks — see I3DTrunk.remat_blocks
    remat_blocks: Optional[Tuple[str, ...]] = None
    s2d_stem: bool = False
    pool_impl: str = "auto"
    stem_impl: str = "auto"
    stem_prestaged: bool = False
    quant: bool = False  # int8 conv contractions (inference only)
    # restrict int8 to these stem/Mixed_* sites (None = everywhere); see
    # I3DTrunk.quant_blocks
    quant_blocks: Optional[Tuple[str, ...]] = None
    fuse_1x1: bool = False  # fused block-input 1×1 convs (exact rewrite)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = I3DTrunk(
            dtype=self.dtype,
            remat=self.remat,
            remat_blocks=self.remat_blocks,
            s2d_stem=self.s2d_stem,
            pool_impl=self.pool_impl,
            stem_impl=self.stem_impl,
            stem_prestaged=self.stem_prestaged,
            quant=self.quant,
            quant_blocks=self.quant_blocks,
            fuse_1x1=self.fuse_1x1,
            name="trunk",
        )(x, train)
        x = i3d_feature_head(x)
        x = flatten(x)
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name="predictions"
        )(x)
        return logits.astype(jnp.float32)


class I3DKinetics(nn.Module):
    """include_top=True Kinetics head (reference train.py:1196-1213):
    avgpool (2,7,7) → dropout → 1×1×1 conv (with bias, no BN/ReLU) →
    temporal-mean logits.  Used for converting/validating Kinetics
    checkpoints."""

    num_classes: int = 400
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = I3DTrunk(dtype=self.dtype, name="trunk")(x, train)
        x = avg_pool_3d(x, (2, 7, 7), (1, 1, 1), "VALID")
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = ConvBN(
            self.num_classes,
            (1, 1, 1),
            use_bias=True,
            use_bn=False,
            use_relu=False,
            dtype=self.dtype,
            name="Conv3d_6a_1x1",
        )(x, train)
        # (N, T', 1, 1, classes) → mean over remaining frames → logits
        x = x.reshape((x.shape[0], x.shape[1], x.shape[-1]))
        return jnp.mean(x, axis=1).astype(jnp.float32)
