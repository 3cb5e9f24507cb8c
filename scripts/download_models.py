#!/usr/bin/env python
"""Fetch the pretrained Chatterbox checkpoint into MODEL_PATH.

Reference equivalent: /root/reference/scripts/download_models.py (HF snapshot
of ResembleAI/chatterbox baked into the Docker image). The same snapshot files
(ve.safetensors, t3_cfg.safetensors, s3gen.safetensors, tokenizer.json) are
consumed here by runtime/loader.py. Requires network access + huggingface_hub.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_tpu.config import get_settings

REPO_ID = "ResembleAI/chatterbox"


def download_models(target_dir: str | None = None) -> str:
    target_dir = target_dir or get_settings().MODEL_PATH
    try:
        from huggingface_hub import snapshot_download
    except ImportError as exc:  # pragma: no cover
        raise SystemExit(
            "huggingface_hub is not installed in this environment; fetch the "
            f"snapshot of {REPO_ID} elsewhere and place it at {target_dir}."
        ) from exc
    os.makedirs(target_dir, exist_ok=True)
    path = snapshot_download(repo_id=REPO_ID, local_dir=target_dir)
    print(f"Models downloaded to {path}")
    return path


if __name__ == "__main__":
    download_models(sys.argv[1] if len(sys.argv) > 1 else None)
