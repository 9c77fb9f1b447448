"""MSRResNet generator (reference: archs/srresnet_arch.py:8-65). NHWC flax."""

from __future__ import annotations

from flax import linen as nn

from ssl_tpu.archs.arch_util import (Conv3x3, ResidualBlockNoBN, pixel_shuffle,
                                     resize_bilinear)
from ssl_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class MSRResNet(nn.Module):
    """Modified SRResNet: 16 no-BN residual blocks + pixelshuffle upsampling +
    bilinear-like base skip (reference uses interpolated input add)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(x))
        body = feat
        for i in range(self.num_block):
            body = ResidualBlockNoBN(self.num_feat, name=f"body_{i}")(body)
        if self.upscale in (2, 3):
            body = nn.Conv(self.num_feat * self.upscale ** 2, (3, 3), padding="SAME", name="upconv1")(body)
            body = lrelu(pixel_shuffle(body, self.upscale))
        elif self.upscale == 4:
            body = nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="upconv1")(body)
            body = lrelu(pixel_shuffle(body, 2))
            body = nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="upconv2")(body)
            body = lrelu(pixel_shuffle(body, 2))
        out = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_hr")(body))
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(out)
        # reference srresnet_arch.py:76: bilinear (align_corners=False) base
        base = resize_bilinear(x, self.upscale)
        return out + base
