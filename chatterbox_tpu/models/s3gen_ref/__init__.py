"""Checkpoint-compatible S3Gen stack (reference architecture in JAX).

Serves the pretrained ``s3gen.safetensors`` voices 1:1 (SURVEY.md §2b rows
3-4). The TPU-first DiT redesign lives in ``models/s3gen``; the engine picks
via ``EngineConfig.s3gen_arch`` / ``CHATTERBOX_S3GEN_ARCH``.
"""
from .config import (  # noqa: F401
    CampPlusConfig,
    FlowRefConfig,
    HiFTConfig,
    S3GenRefConfig,
    S3TokRefConfig,
)
from .model import (  # noqa: F401
    init_s3gen_ref_params,
    init_s3gen_stream_state,
    s3gen_ref_embed_ref,
    s3gen_ref_inference,
    s3gen_ref_inference_streaming,
    s3gen_ref_inference_tail,
    s3gen_ref_prompt_prefill,
)
from .tokenizer import s3tok_ref_tokenize  # noqa: F401
