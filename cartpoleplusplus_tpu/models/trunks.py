"""Shared network trunks — the rebuild of the reference's ``base_network.py``.

The reference's ``Network`` base class provides (a) an input-processing switch
— flatten for low-dim state, a small conv stack for raw pixels — (b) hidden
fully-connected layers, and (c) opt-in batch-norm (reference:
base_network.py:~L90-190).  Here those become flax modules; variable scoping
and target-network copies (reference ~L40-90) are subsumed by flax's
functional params + ``soft_target_update`` in models/target.py.

TPU notes: dense/conv compute runs in bfloat16 on the MXU with float32 params
and outputs (``dtype``/``param_dtype`` split), sized so XLA tiles cleanly.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# Reference hidden sizes (base_network.py hidden_layers_on; reconstructed).
DEFAULT_HIDDEN = (100, 50)


def flatten_obs(obs: jnp.ndarray, batched: bool) -> jnp.ndarray:
    """Low-dim obs (…, repeats, 2, 7) → flat features (…, repeats*14).

    Matches the reference's input flattening for non-pixel state
    (base_network.py:~L90-110).
    """
    lead = obs.shape[:1] if batched else ()
    return obs.reshape(lead + (-1,))


def pixels_to_nhwc(
    obs: jnp.ndarray, batched: bool, height: int = 50, width: int = 50
) -> jnp.ndarray:
    """Flat pixel obs (…, repeats, cams·H·W·3) → (…, H, W, repeats·cams·3).

    The reference feeds conv nets with repeat/camera frames stacked in the
    channel axis (base_network.py simple_conv_net input handling).  Only used
    by the optional conv encoder — the default TPU pixel path is the dense
    embedding in ObsEncoder, which consumes the flat layout directly.
    """
    if not batched:
        obs = obs[None]
    b, r, f = obs.shape
    c = f // (height * width * 3)
    # Flat frames are plane-major per camera: (cam, rgb, H, W).
    planes = obs.reshape(b, r, c, 3, height, width)
    nhwc = jnp.transpose(planes, (0, 4, 5, 1, 2, 3)).reshape(
        b, height, width, r * c * 3
    )
    return nhwc if batched else nhwc[0]


class MLPTrunk(nn.Module):
    """Hidden FC stack (reference base_network.hidden_layers_on)."""

    hidden: Sequence[int] = DEFAULT_HIDDEN
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, dtype=self.dtype, name=f"hidden{i}")(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class ConvTrunk(nn.Module):
    """Small conv stack for 50×50 pixel observations.

    Rebuild of the reference's ``simple_conv_net`` (base_network.py:~L110-150):
    a few stride-2 convs with ~8 filters then flatten.  Channel counts are
    raised to MXU-friendly multiples (XLA pads tiny channel dims anyway, so
    wider is free on TPU and learns better).
    """

    features: Sequence[int] = (16, 32, 32)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, nhwc: jnp.ndarray) -> jnp.ndarray:
        x = nhwc.astype(self.dtype)
        for i, feat in enumerate(self.features):
            x = nn.Conv(
                feat, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"conv{i}"
            )(x)
            x = nn.relu(x)
        return x.reshape(x.shape[:-3] + (-1,)).astype(jnp.float32)


class ObsEncoder(nn.Module):
    """Input-processing switch: low-dim flatten+MLP or pixel embedding+MLP.

    The single entry point agents use — mirrors the reference's
    ``input_state_network`` dispatch on --use-raw-pixels.
    Expects a leading batch dimension.

    Pixel path: the default is a dense embedding of the FLAT frame stack —
    one big MXU matmul (22500·emb bf16) with zero layout churn.  The
    reference's conv trunk survives as ``pixel_encoder='conv'``
    (base_network.py simple_conv_net parity) but costs ~5× more on TPU at
    these image sizes because NHWC materialization lane-pads the 3-channel
    axis.
    """

    use_raw_pixels: bool = False
    hidden: Sequence[int] = DEFAULT_HIDDEN
    pixel_encoder: str = "dense"  # 'dense' | 'conv'
    pixel_embed: int = 256
    pixel_pool: int = 1  # k×k average-pool before the dense embed
    conv_features: Sequence[int] = (16, 32, 32)
    use_batch_norm: bool = False
    height: int = 50
    width: int = 50
    dtype: jnp.dtype = jnp.bfloat16

    def _pool(self, obs: jnp.ndarray) -> jnp.ndarray:
        """k×k average-pool each plane of the flat frame stack.

        The dense embed's 22500-wide contraction dominates BOTH the live
        actor forward (a full-layout relayout of (envs, 22500) activations —
        measured 1.1 ms/step at 4096 envs, BASELINE.md trace table) and the
        train step (22500×embed f32 params × ~16 HBM passes through
        fwd/bwd/adam/targets).  A 2×2 mean pool shrinks all of it 4× for
        sub-pixel information loss at 50×50 (the pole is ~3 px wide; its
        average survives).  Fuses into the uint8-decode chain — the pool
        itself is ~free.
        """
        k = self.pixel_pool
        h, w = self.height, self.width
        if h % k or w % k:
            raise ValueError(f"pixel_pool {k} must divide {h}x{w}")
        lead = obs.shape[:-1]
        if obs.shape[-1] % (h * w):
            raise ValueError(
                f"pixel_pool expects flat {h}x{w} planes, got frame width "
                f"{obs.shape[-1]} (env-side config.obs_pool already applied? "
                f"use one pooling stage, not both)"
            )
        planes = obs.shape[-1] // (h * w)
        x = obs.reshape(lead + (planes, h // k, k, w // k, k))
        return jnp.mean(x, axis=(-3, -1)).reshape(lead + (-1,))

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.use_raw_pixels and obs.dtype == jnp.uint8:
            # uint8 end-to-end pixel path: the renderer quantizes frames on
            # device (replay stores them verbatim — no re-encode) and the
            # network is the single decode point.  4× less HBM traffic on
            # every obs hop of the fused loop.
            obs = obs.astype(self.dtype) * (1.0 / 255.0)
        if self.use_raw_pixels:
            if self.pixel_encoder == "conv":
                # height/width are the dims the obs pipeline carries — after
                # env-side config.obs_pool (thread config.obs_height/width).
                h, w = self.height, self.width
                if self.pixel_pool > 1:
                    # Same network-side pool as the dense branch (it was
                    # once silently ignored here — a dead knob).
                    obs = self._pool(obs.astype(self.dtype))
                    h, w = h // self.pixel_pool, w // self.pixel_pool
                x = pixels_to_nhwc(obs, batched=True, height=h, width=w)
                x = ConvTrunk(self.conv_features, dtype=self.dtype)(x)
            else:
                if self.pixel_pool > 1:
                    obs = self._pool(obs.astype(self.dtype))
                x = flatten_obs(obs, batched=True).astype(self.dtype)
                x = nn.Dense(self.pixel_embed, dtype=self.dtype, name="pixel_embed")(x)
                x = nn.relu(x).astype(jnp.float32)
        else:
            x = flatten_obs(obs, batched=True)
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return MLPTrunk(self.hidden, dtype=self.dtype)(x)
