from .model import S3TokConfig, init_s3tok_params, s3tok_tokenize, S3_SR, drop_invalid_tokens

__all__ = ["S3TokConfig", "init_s3tok_params", "s3tok_tokenize", "S3_SR", "drop_invalid_tokens"]
