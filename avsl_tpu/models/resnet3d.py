"""Visual frontend: Conv3D stem + per-frame ResNet-18 trunk.

Same capability as the reference's visual frontend
(avsl/modules/resnet.py: Conv3d(1->64, k=(5,7,7), s=(1,2,2)) + BN + PReLU +
MaxPool3d, time folded into batch, BasicBlock [2,2,2,2] ResNet-18 with
PReLU / average-pool-downsample options, global average pool -> 512 per
frame), re-expressed TPU-first:

* channels-last layout throughout ([B, T, H, W, C]) — XLA's native conv
  layout on TPU, so every conv lands on the MXU without transposes;
* the time fold is a reshape (free), all frames of a clip batch through
  the 2-D trunk as one big conv batch;
* BatchNorm keeps running stats in the flax ``batch_stats`` collection;
  ``use_running_average`` is threaded so the Flamingo config's
  ``freeze_video_batch_norm_stats`` regime is expressible.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class TimeChannelStemConv(nn.Module):
    """The Conv3D stem (k=(5,7,7), s=(1,2,2), C_in=1) computed as a 2-D
    conv with the 5 temporal taps stacked on the channel axis.

    XLA:TPU's conv emitter handles the C_in=1 3-D conv pathologically
    (measured on v5e at the train envelope [1,250,88,88,1]: 8.6 ms,
    1.9 TFLOP/s — 20% of the whole train micro-step). The identical
    arithmetic expressed as [B*T, H, W, 5] @ k(7,7) s(2,2) runs in
    0.44 ms (34.5 TFLOP/s), bit-equal in bf16 (scripts/profile_sublayers.py
    / round-5 notes). The param keeps the Conv3D layout [5,7,7,1,C] under
    the same ``stem_conv/kernel`` name so checkpoint converters
    (models/convert.py) are unchanged.
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,T,H,W,1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (5, 7, 7, 1, self.features),
            self.param_dtype,
        )
        b, t, h, w, _ = x.shape
        xt = x[..., 0].astype(self.dtype)                    # [B,T,H,W]
        xp = jnp.pad(xt, ((0, 0), (2, 2), (0, 0), (0, 0)))   # T pad = conv3d's (2,2)
        sh = jnp.stack([xp[:, i:i + t] for i in range(5)], -1)  # [B,T,H,W,5]
        sh = sh.reshape(b * t, h, w, 5)
        w2d = kernel[:, :, :, 0, :].transpose(1, 2, 0, 3).astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            sh, w2d, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(b, t, out.shape[1], out.shape[2], self.features)


class ChannelPReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(num_parameters=C)`` semantics:
    one learned negative slope per channel, reference
    avsl/modules/resnet.py:59-61). flax's ``nn.PReLU`` is scalar-only."""

    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        slope = self.param(
            "negative_slope",
            lambda _, shape: jnp.full(shape, 0.25, self.param_dtype),
            (x.shape[-1],),
        )
        return jnp.where(x >= 0, x, x * slope.astype(x.dtype))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    relu_type: str = "prelu"
    avg_pool_downsample: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        # two distinct per-channel PReLUs, as in the reference block
        # (avsl/modules/resnet.py:59-61: relu1/relu2, num_parameters=planes)
        if self.relu_type == "prelu":
            act1 = ChannelPReLU(param_dtype=self.param_dtype, name="prelu1")
            act2 = ChannelPReLU(param_dtype=self.param_dtype, name="prelu2")
        else:
            act1 = act2 = nn.relu
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=use_running_average,
            momentum=0.9,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name=name,
        )
        conv = lambda name, stride: nn.Conv(  # noqa: E731
            self.planes,
            (3, 3),
            strides=(stride, stride),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

        residual = x
        out = conv("conv1", self.stride)(x)
        out = act1(norm("bn1")(out).astype(self.dtype))
        out = conv("conv2", 1)(out)
        out = norm("bn2")(out).astype(self.dtype)

        if self.stride != 1 or x.shape[-1] != self.planes:
            if self.avg_pool_downsample:
                if self.stride != 1:
                    residual = nn.avg_pool(
                        residual,
                        (self.stride, self.stride),
                        strides=(self.stride, self.stride),
                    )
                residual = nn.Conv(
                    self.planes,
                    (1, 1),
                    use_bias=False,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="downsample_conv",
                )(residual)
            else:
                residual = nn.Conv(
                    self.planes,
                    (1, 1),
                    strides=(self.stride, self.stride),
                    use_bias=False,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="downsample_conv",
                )(residual)
            residual = norm("downsample_bn")(residual).astype(self.dtype)

        return act2(out + residual)


class ResNetTrunk(nn.Module):
    """2-D ResNet-18 trunk: [N, H, W, 64] -> [N, 512] (global avg pool)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    planes: Sequence[int] = (64, 128, 256, 512)
    relu_type: str = "prelu"
    avg_pool_downsample: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        for stage, (n_blocks, planes) in enumerate(zip(self.layers, self.planes)):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(
                    planes=planes,
                    stride=stride,
                    relu_type=self.relu_type,
                    avg_pool_downsample=self.avg_pool_downsample,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, use_running_average)
        return jnp.mean(x, axis=(1, 2))  # global average pool


class ResNet3DFrontend(nn.Module):
    """Lip-clip encoder: [B, T, H, W(, 1)] -> [B, T, backbone_channels].

    Stem: Conv3D(1->frontend_channels, k=(5,7,7), s=(1,2,2)) + BN + PReLU +
    MaxPool(1,3,3)/(1,2,2); then the time axis folds into the batch and all
    frames run through the 2-D ResNet trunk together.

    Accepts video without the trailing singleton channel ([B, T, H, W]) and
    expands it here, INSIDE the module: when the frontend is wrapped in
    ``nn.remat`` its input is a saved residual, and a 5D
    ``bf16[1,T,88,88,1]`` residual gets an XLA layout whose tiled minor
    dims are (batch=1, channel=1) — a measured 256x pad expansion (2.77 GB
    for an 11 MB tensor at the large-v2 train envelope). The 4D form tiles
    (H, W) and pads ~1.5x, so memory-tight callers feed 4D.
    """

    frontend_channels: int = 64
    backbone_channels: int = 512
    relu_type: str = "prelu"
    avg_pool_downsample: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,
        use_running_average: bool = True,
    ) -> jnp.ndarray:
        if video.ndim == 4:
            video = video[..., None]
        b, t = video.shape[0], video.shape[1]
        x = video.astype(self.dtype)
        x = TimeChannelStemConv(
            self.frontend_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="stem_bn",
        )(x).astype(self.dtype)
        if self.relu_type == "prelu":
            x = ChannelPReLU(param_dtype=self.param_dtype, name="stem_prelu")(x)
        else:
            x = nn.relu(x)
        x = nn.max_pool(
            x,
            window_shape=(1, 3, 3),
            strides=(1, 2, 2),
            padding=((0, 0), (1, 1), (1, 1)),
        )
        # fold time into batch: [B*T, H', W', C]
        _, _, h, w, c = x.shape
        x = x.reshape(b * t, h, w, c)
        bc = self.backbone_channels
        x = ResNetTrunk(
            planes=(max(bc // 8, 8), max(bc // 4, 8), max(bc // 2, 8), bc),
            relu_type=self.relu_type,
            avg_pool_downsample=self.avg_pool_downsample,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="trunk",
        )(x, use_running_average)
        return x.reshape(b, t, self.backbone_channels)
