from vqgan_tpu.models.ae import VAE, Decoder, Encoder
from vqgan_tpu.models.quant import VectorQuantizer
from vqgan_tpu.models.tae import TVAE

__all__ = ["VAE", "Encoder", "Decoder", "TVAE", "VectorQuantizer"]
