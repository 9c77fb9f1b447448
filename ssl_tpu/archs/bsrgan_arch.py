"""BSRGAN / BebyGAN RRDB generator flavors.

Reference parity: archs/bsrgan_arch.py:73 (BSRGANRRDBNet, sf 2/4) and
archs/rrdbbebygan_arch.py:54 (RRDBBebyGANNet, fixed x4).  Both are RRDB trunks
with nearest-up tails and no pixel-unshuffle — thin wrappers over the shared
blocks here."""

from __future__ import annotations

from flax import linen as nn

from ssl_tpu.archs.rrdbnet_arch import RRDB
from ssl_tpu.archs.arch_util import resize_nearest
from ssl_tpu.utils.registry import ARCH_REGISTRY


class _RRDBTrunkNet(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        fea = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(x)
        trunk = fea
        for i in range(self.num_block):
            trunk = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(trunk)
        trunk = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="trunk_conv")(trunk)
        fea = fea + trunk
        fea = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="upconv1")(resize_nearest(fea, 2)))
        if self.upscale == 4:
            fea = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="upconv2")(resize_nearest(fea, 2)))
        out = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="HRconv")(fea))
        return nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(out)


@ARCH_REGISTRY.register()
class BSRGANRRDBNet(nn.Module):
    """KAIR/BSRGAN RRDB net (reference bsrgan_arch.py:73-103)."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    sf: int = 4

    @nn.compact
    def __call__(self, x):
        return _RRDBTrunkNet(self.in_nc, self.out_nc, self.nf, self.nb,
                             self.gc, self.sf, name="net")(x)


@ARCH_REGISTRY.register()
class RRDBBebyGANNet(nn.Module):
    """BebyGAN generator (reference rrdbbebygan_arch.py:54-80), fixed x4."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        return _RRDBTrunkNet(self.in_nc, self.out_nc, self.nf, self.nb,
                             self.gc, 4, name="net")(x)
