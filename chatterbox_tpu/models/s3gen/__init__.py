from .config import S3GenConfig
from .model import init_s3gen_params, s3gen_inference, s3gen_embed_ref

S3GEN_SR = 24000

__all__ = ["S3GenConfig", "S3GEN_SR", "init_s3gen_params", "s3gen_inference", "s3gen_embed_ref"]
