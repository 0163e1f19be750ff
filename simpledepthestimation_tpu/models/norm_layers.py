"""Normalization-layer variants.

Parity with reference detectron2/layers/batch_norm.py:13-245 and
conv_tf.py:1-66:

- ``FrozenBatchNorm``: BN with fixed affine+statistics (never updated),
  used to freeze pretrained encoder stats (BTS BN_NO_TRACK option).
- ``SyncBatchNorm``: cross-replica BN — the NaiveSyncBatchNorm analog.
  Under the SPMD jit train step (parallel/train_step.py) the batch axis is
  sharded over the 'data' mesh axis but the program is written *globally*:
  a plain ``nn.BatchNorm``'s batch-mean IS the global-batch mean, and XLA
  derives the cross-device all-reduce from the shardings. What took a
  custom autograd AllReduce in torch (batch_norm.py:158-245) is the
  default semantics here — verified by the 8-device stat-equality test in
  tests/test_parallel.py. ``axis_name`` is accepted only for shard_map /
  pmap contexts where a collective axis is actually bound.
- ``get_norm``: string → constructor dispatch (reference batch_norm.py:130-155).
- ``conv_same_padding``: TF 'SAME' asymmetric padding helper (the Conv2dTF
  family) for TF-checkpoint-compatible stacks.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params.

    Stats/affine live in the 'batch_stats'/'params' collections so converted
    pretrained values can be injected, but are never updated by training
    (scale/bias get zero gradient contribution only through the optimizer
    mask if desired; statistics are simply never recomputed).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))
        inv = scale / jnp.sqrt(var.value + self.epsilon)
        return x * inv + (bias - mean.value * inv)


def SyncBatchNorm(train: bool, axis_name: Optional[str] = None, **kwargs) -> nn.BatchNorm:
    """Cross-replica BatchNorm.

    Inside the SPMD jit train step, global-batch statistics (= sync-BN
    semantics) are the default — XLA inserts the cross-device reduction
    from the data sharding, so no axis name is needed (and none is bound).
    Pass ``axis_name`` only under shard_map/pmap, where the named axis
    exists and flax's psum-based reduction applies."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=kwargs.pop("momentum", 0.9),
        axis_name=axis_name,
        dtype=jnp.float32,
        **kwargs,
    )


def get_norm(norm: Optional[str], train: bool):
    """String → norm constructor (reference batch_norm.py:130-155)."""
    if norm is None or norm == "":
        return lambda name: (lambda x: x)
    table = {
        "BN": lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name=name
        ),
        "FrozenBN": lambda name: FrozenBatchNorm(name=name),
        "SyncBN": lambda name: SyncBatchNorm(train, name=name),
        "GN": lambda name: nn.GroupNorm(num_groups=32, dtype=jnp.float32, name=name),
        "LN": lambda name: nn.LayerNorm(dtype=jnp.float32, name=name),
    }
    return table[norm]


def same_padding(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF 'SAME' asymmetric padding for one spatial dim
    (reference conv_tf.py: pads more on the bottom/right)."""
    out = -(-size // stride)
    total = max((out - 1) * stride + kernel - size, 0)
    return total // 2, total - total // 2


class Conv2dTF(nn.Module):
    """Conv with TF 'SAME' padding semantics (reference conv_tf.py:7-34)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ph = same_padding(x.shape[1], self.kernel_size, self.stride)
        pw = same_padding(x.shape[2], self.kernel_size, self.stride)
        return nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[ph, pw],
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class MaxPool2dTF(nn.Module):
    """Max pool with TF 'SAME' padding (reference conv_tf.py:37-66)."""

    kernel_size: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.max_pool(
            x,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
        )
