"""Native checkpoint format: save/load the framework's own parameter pytrees.

Checkpoint/resume parity (SURVEY.md §5.4): the reference only consumes a HF
snapshot; this framework additionally round-trips its own weights so
fine-tuned/distilled models can be served. Format: one safetensors file per
model ({t3,s3gen,s3tok,ve}.safetensors with '/'-joined pytree keys; list
nodes use numeric segments) plus chatterbox_tpu.json recording the configs.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

NATIVE_MANIFEST = "chatterbox_tpu.json"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray], dtype, prefix: str = "") -> Any:
    if isinstance(template, dict):
        return {
            k: _unflatten_into(v, flat, dtype, f"{prefix}{k}/") for k, v in template.items()
        }
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten_into(v, flat, dtype, f"{prefix}{i}/") for i, v in enumerate(template)
        ]
        return type(template)(seq) if isinstance(template, tuple) else seq
    key = prefix[:-1]
    if key not in flat:
        raise KeyError(f"checkpoint missing tensor {key}")
    value = flat[key]
    if tuple(value.shape) != tuple(template.shape):
        raise ValueError(f"{key}: checkpoint shape {value.shape} != model {template.shape}")
    return jnp.asarray(value, dtype=dtype)


def save_checkpoint(path: str | Path, params: Dict, engine_cfg) -> None:
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    for name, tree in params.items():
        host = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), tree)
        save_file(_flatten(host), str(path / f"{name}.safetensors"))
    configs = {
        "t3": dataclasses.asdict(engine_cfg.t3),
        "ve": dataclasses.asdict(engine_cfg.ve),
    }
    if getattr(engine_cfg, "s3gen_arch", "dit") == "ref":
        configs["s3gen"] = dataclasses.asdict(engine_cfg.s3gen_ref)
    else:
        configs["s3gen"] = dataclasses.asdict(engine_cfg.s3gen)
        configs["s3tok"] = dataclasses.asdict(engine_cfg.s3tok)
    manifest = {
        "format": "chatterbox_tpu/v1",
        "models": sorted(params.keys()),
        "s3gen_arch": getattr(engine_cfg, "s3gen_arch", "dit"),
        "configs": configs,
    }
    (path / NATIVE_MANIFEST).write_text(json.dumps(manifest, indent=2))


def is_native_checkpoint(path: str | Path) -> bool:
    return (Path(path) / NATIVE_MANIFEST).exists()


def load_checkpoint(path: str | Path, engine_cfg, dtype) -> Dict:
    """Load a native checkpoint into freshly-structured pytrees (shape-checked
    against the given configs)."""
    from safetensors.numpy import load_file

    from ..models.s3gen import init_s3gen_params
    from ..models.s3gen_ref import init_s3gen_ref_params
    from ..models.s3tok import init_s3tok_params
    from ..models.t3 import init_t3_params
    from ..models.voice_encoder import init_voice_encoder_params

    from ..ops.initializers import shape_only_init

    path = Path(path)
    manifest = json.loads((path / NATIVE_MANIFEST).read_text())
    arch = manifest.get("s3gen_arch", "dit")
    cfg_arch = getattr(engine_cfg, "s3gen_arch", "dit")
    if arch != cfg_arch:
        raise ValueError(
            f"checkpoint was saved with s3gen_arch={arch!r} but the engine is "
            f"configured for {cfg_arch!r} (set CHATTERBOX_S3GEN_ARCH={arch})"
        )
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    with shape_only_init():  # structural templates only — no RNG/allocation
        templates = {
            "t3": init_t3_params(k1, engine_cfg.t3, dtype),
            "ve": init_voice_encoder_params(k4, engine_cfg.ve, dtype),
        }
        if arch == "ref":
            templates["s3gen"] = init_s3gen_ref_params(k2, engine_cfg.s3gen_ref, dtype)
        else:
            templates["s3gen"] = init_s3gen_params(k2, engine_cfg.s3gen, dtype)
            templates["s3tok"] = init_s3tok_params(k3, engine_cfg.s3tok, dtype)
    params = {}
    for name, template in templates.items():
        flat = load_file(str(path / f"{name}.safetensors"))
        params[name] = _unflatten_into(template, flat, dtype)
    return params
