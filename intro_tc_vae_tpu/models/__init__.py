"""Model zoo: conv VAE encoder/decoders in NHWC layout (TPU-native).

Parity surface of the reference models.py: three block architectures
('conv', 'res', 'inception'), Encoder/Decoder/SoftIntroVAE with identical
topology (5x5 stem, AvgPool/2 downsample, nearest-neighbor x2 upsample,
fc -> 2*z_dim chunk, sigmoid head).
"""

from intro_tc_vae_tpu.models.blocks import (
    Conv2dBatchNorm,
    ConvolutionalBlock,
    InceptionResnetBlock,
    ResidualBlock,
    get_conv_class,
)
from intro_tc_vae_tpu.models.vae import Decoder, Encoder, SoftIntroVAE

__all__ = [
    "Conv2dBatchNorm",
    "ConvolutionalBlock",
    "InceptionResnetBlock",
    "ResidualBlock",
    "get_conv_class",
    "Encoder",
    "Decoder",
    "SoftIntroVAE",
]
