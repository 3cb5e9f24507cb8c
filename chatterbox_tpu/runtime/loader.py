"""Checkpoint loading: reference safetensors → chatterbox_tpu parameter pytrees.

The reference serving stack loads ``ve.safetensors``, ``t3_cfg.safetensors``,
``s3gen.safetensors``, ``tokenizer.json`` and ``conds.pt`` from a HF snapshot
(SURVEY.md §5.4; /root/reference/scripts/download_models.py:8-17). This module
maps those tensors into our pytrees where the architectures line up.

Status of the mapping (documented honestly — the pretrained artifacts are not
available in this build environment, so conversion is validated structurally,
not numerically):

* T3: the llama backbone maps 1:1 (q/k/v/o, gate/up/down, norms, embeddings,
  heads, learned position embeddings). Key names follow the HF LlamaModel
  convention used by the reference checkpoint.
* VoiceEncoder: LSTM weights map 1:1 (3×LSTM(256) + proj).
* S3Gen: with ``s3gen_arch='ref'`` (the default for the full model) the
  checkpoint-compatible stack in ``models/s3gen_ref`` converts the full
  ``s3gen.safetensors`` key schema (tokenizer / CAMPPlus / conformer-CFM
  flow / HiFT) via ``models/s3gen_ref/convert.py`` with strict
  missing/unused/mismatch reporting. With ``s3gen_arch='dit'`` the TPU-first
  DiT redesign serves instead and the checkpoint's S3Gen tensors are skipped.

``load_reference_checkpoint`` returns None when required files are missing so
the engine falls back to random init.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from ..logging_config import log


def _load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(str(path))


def _assign(
    dst: Dict, path: list, value: np.ndarray, dtype, report: list,
    row_prefix: bool = False,
) -> None:
    node = dst
    for k in path[:-1]:
        node = node[k]
    leaf = node[path[-1]]
    if row_prefix and value.shape[1:] == leaf.shape[1:] and value.shape[0] >= leaf.shape[0]:
        # checkpoint table longer than our budget → take the row prefix
        # (learned position tables: the checkpoint covers training budgets of
        # 2048 text / 4096 speech positions; serving never indexes past our
        # smaller ones — reference decode cap tts_streaming.py:423)
        value = value[: leaf.shape[0]]
    if tuple(leaf.shape) != tuple(value.shape):
        report.append(f"shape mismatch at {'/'.join(map(str, path))}: {leaf.shape} vs {value.shape}")
        return
    node[path[-1]] = jnp.asarray(value, dtype=dtype)


def convert_t3(
    raw: Dict[str, np.ndarray], params: Dict, dtype,
    used: Optional[set] = None, report_out: Optional[list] = None,
) -> Dict:
    """Map HF-Llama-style T3 tensors into the stacked-layer pytree.

    ``used`` (optional set) collects every checkpoint key consumed and
    ``report_out`` (optional list) the shape-mismatch reports, so tests can
    assert nothing silently drifts out of the mapping."""
    report: list = [] if report_out is None else report_out
    if used is None:
        used = set()
    L = params["backbone"]["layers"]["wq"].shape[0]

    def stack(fmt: str, transpose: bool = True) -> Optional[np.ndarray]:
        mats = []
        for i in range(L):
            key = fmt.format(i=i)
            if key not in raw:
                return None
            m = raw[key]
            used.add(key)
            mats.append(m.T if transpose and m.ndim == 2 else m)
        return np.stack(mats)

    prefixes = ["tfmr.layers.{i}.", "t3.tfmr.layers.{i}.", "model.layers.{i}."]
    for pre in prefixes:
        wq = stack(pre + "self_attn.q_proj.weight")
        if wq is None:
            continue
        mapping = {
            ("backbone", "layers", "wq"): wq,
            ("backbone", "layers", "wk"): stack(pre + "self_attn.k_proj.weight"),
            ("backbone", "layers", "wv"): stack(pre + "self_attn.v_proj.weight"),
            ("backbone", "layers", "wo"): stack(pre + "self_attn.o_proj.weight"),
            ("backbone", "layers", "w_gate"): stack(pre + "mlp.gate_proj.weight"),
            ("backbone", "layers", "w_up"): stack(pre + "mlp.up_proj.weight"),
            ("backbone", "layers", "w_down"): stack(pre + "mlp.down_proj.weight"),
            ("backbone", "layers", "attn_norm"): stack(pre + "input_layernorm.weight", transpose=False),
            ("backbone", "layers", "mlp_norm"): stack(pre + "post_attention_layernorm.weight", transpose=False),
        }
        for path, value in mapping.items():
            if value is not None:
                _assign(params, list(path), value, dtype, report)
        break

    flat_map = {
        "text_emb.weight": ("text_emb",),
        "speech_emb.weight": ("speech_emb",),
        "text_head.weight": ("text_head", "w"),
        "text_head.bias": ("text_head", "b"),
        "speech_head.weight": ("speech_head", "w"),
        "speech_head.bias": ("speech_head", "b"),
        "text_pos_emb.emb.weight": ("text_pos",),
        "speech_pos_emb.emb.weight": ("speech_pos",),
        "tfmr.norm.weight": ("backbone", "final_norm"),
        "cond_enc.spkr_enc.weight": ("cond", "spkr", "w"),
        "cond_enc.spkr_enc.bias": ("cond", "spkr", "b"),
        "cond_enc.emotion_adv_fc.weight": ("cond", "emotion", "w"),
        "cond_enc.emotion_adv_fc.bias": ("cond", "emotion", "b"),
    }
    if "perceiver" in params["cond"]:
        # public Chatterbox Perceiver state-dict (one shared AttentionBlock2
        # applied cross then self — models/t3/model.py perceiver_resample)
        flat_map.update({
            "cond_enc.perceiver.pre_attention_query": ("cond", "perceiver", "query"),
            "cond_enc.perceiver.attn.norm.weight": ("cond", "perceiver", "attn", "norm_w"),
            "cond_enc.perceiver.attn.norm.bias": ("cond", "perceiver", "attn", "norm_b"),
            "cond_enc.perceiver.attn.to_q.weight": ("cond", "perceiver", "attn", "wq", "w"),
            "cond_enc.perceiver.attn.to_q.bias": ("cond", "perceiver", "attn", "wq", "b"),
            "cond_enc.perceiver.attn.to_k.weight": ("cond", "perceiver", "attn", "wk", "w"),
            "cond_enc.perceiver.attn.to_k.bias": ("cond", "perceiver", "attn", "wk", "b"),
            "cond_enc.perceiver.attn.to_v.weight": ("cond", "perceiver", "attn", "wv", "w"),
            "cond_enc.perceiver.attn.to_v.bias": ("cond", "perceiver", "attn", "wv", "b"),
            "cond_enc.perceiver.attn.proj_out.weight": ("cond", "perceiver", "attn", "wo", "w"),
            "cond_enc.perceiver.attn.proj_out.bias": ("cond", "perceiver", "attn", "wo", "b"),
        })
    for key, path in flat_map.items():
        for candidate in (key, "t3." + key):
            if candidate in raw:
                used.add(candidate)
                v = raw[candidate]
                if v.ndim == 2 and path[-1] in ("w",):
                    v = v.T
                if path[-1] == "query" and v.ndim == 3 and v.shape[0] == 1:
                    v = v[0]  # checkpoint stores the query bank as [1, N, D]
                _assign(params, list(path), v, dtype, report,
                        row_prefix=path[-1] in ("text_pos", "speech_pos"))
                break
    if report:
        log.warning("T3 conversion: %d tensors left at init:\n  %s", len(report), "\n  ".join(report[:20]))
    return params


def convert_voice_encoder(
    raw: Dict[str, np.ndarray], params: Dict, dtype,
    used: Optional[set] = None, report_out: Optional[list] = None,
) -> Dict:
    report: list = [] if report_out is None else report_out
    if used is None:
        used = set()
    for i, layer in enumerate(params["lstm"]):
        for src, dst in (
            (f"lstm.weight_ih_l{i}", "wx"),
            (f"lstm.weight_hh_l{i}", "wh"),
        ):
            if src in raw:
                used.add(src)
                _assign({"x": layer}, ["x", dst], raw[src].T, dtype, report)
        bias = None
        if f"lstm.bias_ih_l{i}" in raw:
            used.add(f"lstm.bias_ih_l{i}")
            bias = raw[f"lstm.bias_ih_l{i}"]
            if f"lstm.bias_hh_l{i}" in raw:
                used.add(f"lstm.bias_hh_l{i}")
                bias = bias + raw[f"lstm.bias_hh_l{i}"]
        if bias is not None:
            _assign({"x": layer}, ["x", "b"], bias, dtype, report)
    if "proj.weight" in raw:
        used.add("proj.weight")
        _assign(params, ["proj", "w"], raw["proj.weight"].T, dtype, report)
    if "proj.bias" in raw:
        used.add("proj.bias")
        _assign(params, ["proj", "b"], raw["proj.bias"], dtype, report)
    if report:
        log.warning("VoiceEncoder conversion issues: %s", report)
    return params


def load_default_conds(path: Path) -> Optional[Dict]:
    """Read ``conds.pt`` — the snapshot's baked-in default voice — without torch.

    The reference facade loads this file and uses it for every request that
    carries no voice_id (/root/reference/src/tts_streaming.py:254-258,
    399-406). Format: ``torch.save({"t3": T3Cond.__dict__, "gen": {...}})``
    where T3Cond holds ``speaker_emb`` [1, 256], ``cond_prompt_speech_tokens``
    [1, ≤150] and ``emotion_adv`` [1, 1, 1], and ``gen`` is the
    ``s3gen.embed_ref`` dict (``prompt_token``/``prompt_token_len``/
    ``prompt_feat``/``prompt_feat_len``/``embedding``).

    Returns normalized numpy fields, or None when the file is absent. Raises
    on malformed content (callers fall back to the neutral default voice).
    """
    if not path.exists():
        return None
    from .torch_pickle import load_torch_archive

    raw = load_torch_archive(path)
    t3 = raw["t3"]
    gen = raw["gen"]
    tokens = np.atleast_2d(np.asarray(t3["cond_prompt_speech_tokens"])).astype(np.int32)
    feat = np.asarray(gen["prompt_feat"], np.float32)
    if feat.ndim == 2:
        feat = feat[None]
    feat_len = gen.get("prompt_feat_len")
    gtok = np.atleast_2d(np.asarray(gen["prompt_token"])).astype(np.int32)
    gtok_len = gen.get("prompt_token_len")
    return {
        "speaker_emb": np.atleast_2d(np.asarray(t3["speaker_emb"], np.float32)),
        "prompt_speech_tokens": tokens,
        "emotion_adv": float(np.asarray(t3.get("emotion_adv", 0.5)).reshape(-1)[0]),
        "prompt_token": gtok,
        "prompt_token_len": int(
            np.asarray(gtok_len).reshape(-1)[0] if gtok_len is not None else gtok.shape[1]
        ),
        "prompt_feat": feat,
        "prompt_feat_len": int(
            np.asarray(feat_len).reshape(-1)[0] if feat_len is not None else feat.shape[1]
        ),
        "embedding": np.atleast_2d(np.asarray(gen["embedding"], np.float32)),
    }


def load_reference_checkpoint(model_dir: Path, engine_cfg, dtype) -> Optional[Dict]:
    """Load what can be loaded; random-init the rest. Returns the params dict
    or None if nothing usable was found."""
    import jax

    from ..models.s3gen import init_s3gen_params
    from ..models.s3gen_ref import init_s3gen_ref_params
    from ..models.s3tok import init_s3tok_params
    from ..models.t3 import init_t3_params
    from ..models.voice_encoder import init_voice_encoder_params

    arch = getattr(engine_cfg, "s3gen_arch", "dit")
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "t3": init_t3_params(k1, engine_cfg.t3, dtype),
        "ve": init_voice_encoder_params(k4, engine_cfg.ve, dtype),
    }
    if arch == "ref":
        params["s3gen"] = init_s3gen_ref_params(k2, engine_cfg.s3gen_ref, dtype)
    else:
        params["s3gen"] = init_s3gen_params(k2, engine_cfg.s3gen, dtype)
        params["s3tok"] = init_s3tok_params(k3, engine_cfg.s3tok, dtype)
    from .manifest import log_manifest_diff

    found = False
    t3_file = model_dir / "t3_cfg.safetensors"
    if t3_file.exists():
        raw = _load_safetensors(t3_file)
        log_manifest_diff("t3_cfg.safetensors", {k: v.shape for k, v in raw.items()})
        params["t3"] = convert_t3(raw, params["t3"], dtype)
        found = True
        log.info("Loaded T3 weights from %s", t3_file)
    ve_file = model_dir / "ve.safetensors"
    if ve_file.exists():
        raw = _load_safetensors(ve_file)
        log_manifest_diff("ve.safetensors", {k: v.shape for k, v in raw.items()})
        params["ve"] = convert_voice_encoder(raw, params["ve"], dtype)
        found = True
        log.info("Loaded VoiceEncoder weights from %s", ve_file)
    s3_file = model_dir / "s3gen.safetensors"
    if s3_file.exists():
        if arch == "ref":
            from ..models.s3gen_ref.convert import convert_s3gen_ref

            raw = _load_safetensors(s3_file)
            log_manifest_diff("s3gen.safetensors", {k: v.shape for k, v in raw.items()})
            result = convert_s3gen_ref(raw, params["s3gen"], engine_cfg.s3gen_ref)
            params["s3gen"] = result["params"]  # converter preserves leaf dtypes
            n_bad = len(result["mismatched"]) + len(result["missing"]) + len(result["unused"])
            if n_bad:
                log.warning(
                    "S3Gen conversion incomplete: %d mismatched, %d missing, "
                    "%d unused. First issues: %s",
                    len(result["mismatched"]), len(result["missing"]),
                    len(result["unused"]),
                    (result["mismatched"] + result["missing"] + result["unused"])[:10],
                )
            else:
                log.info("Loaded S3Gen weights from %s (clean conversion)", s3_file)
        else:
            log.warning(
                "s3gen.safetensors found, but s3gen_arch='dit' serves the "
                "TPU-first DiT redesign which has its own weights; set "
                "CHATTERBOX_S3GEN_ARCH=ref to serve the pretrained stack."
            )
        found = True
    return params if found else None
