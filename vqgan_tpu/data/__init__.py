from vqgan_tpu.data.loader import create_dataloader
from vqgan_tpu.data.synthetic import synthetic_dataloader

__all__ = ["create_dataloader", "synthetic_dataloader"]
