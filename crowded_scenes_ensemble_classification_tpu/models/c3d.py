"""C3D (Tran et al. 2015) as a jitted Flax module.

Behavioural spec from the reference `ConvNets3D` (train.py:1224-1273):
8 conv / 5 pool trunk, asymmetric zero-pad before pool5, FC6/FC7(4096),
softmax head.  Canonical input 16×112×112×3 (train.py:1593-1601).

Differences from the reference implementation (deliberate, semantics
preserved):
- returns logits; apply `jax.nn.softmax` for probabilities (the reference's
  final Dense had `activation='softmax'`),
- dropout driven by an explicit PRNG key instead of global state.

Fine-tune path parity: the reference builds with 487 classes, loads
sports1M weights, pops the softmax and adds a fresh Dense
(train.py:1672-1678); here `C3D(num_classes=...)` plus
`weights_io.load_c3d_keras_weights(..., replace_head=True)` does the same.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import QuantConv, flatten, max_pool_3d


class C3D(nn.Module):
    num_classes: int = 11
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.5
    # width=1.0 is the exact reference topology; smaller values shrink every
    # layer proportionally (CI / ablation use only — converted reference
    # checkpoints require width=1.0).
    width: float = 1.0
    # quant=True runs every conv contraction in int8 on the MXU
    # (inference only; models.common.quant_conv_general).
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.quant and train:
            raise ValueError("quant=True C3D is inference-only")
        w = lambda f: max(int(f * self.width), 8)
        if self.quant:
            from .common import quant_mode

            conv = lambda feats, name: QuantConv(
                feats, kernel_size=(3, 3, 3), padding="SAME",
                mode=quant_mode(self.quant), name=name,
            )
        else:
            conv = lambda feats, name: nn.Conv(
                feats,
                kernel_size=(3, 3, 3),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        x = x.astype(self.dtype)
        x = nn.relu(conv(w(64), "conv1")(x))
        x = max_pool_3d(x, (1, 2, 2), (1, 2, 2), "VALID")

        x = nn.relu(conv(w(128), "conv2")(x))
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), "VALID")

        x = nn.relu(conv(w(256), "conv3a")(x))
        x = nn.relu(conv(w(256), "conv3b")(x))
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), "VALID")

        x = nn.relu(conv(w(512), "conv4a")(x))
        x = nn.relu(conv(w(512), "conv4b")(x))
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), "VALID")

        x = nn.relu(conv(w(512), "conv5a")(x))
        x = nn.relu(conv(w(512), "conv5b")(x))
        # ZeroPadding3D(((0,0),(0,1),(0,1))) then valid 2x2x2 pool
        # (reference train.py:1259-1261).
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2), "VALID")

        x = flatten(x)
        x = nn.relu(
            nn.Dense(w(4096), dtype=self.dtype, param_dtype=jnp.float32, name="fc6")(x)
        )
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(
            nn.Dense(w(4096), dtype=self.dtype, param_dtype=jnp.float32, name="fc7")(x)
        )
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name="fc8"
        )(x)
        return logits.astype(jnp.float32)
