"""Checkpoint-schema manifest: full-size structural guarantees.

VERDICT r2 item 4: the conversion schema is frozen into a checked-in
full-size manifest (chatterbox_tpu/data/checkpoint_manifest.json); these
tests (a) pin the data file to the code, (b) run the converters against
FULL-SIZE synthetic checkpoints (not just .tiny()), and (c) exercise the
load-time diff that makes a real-artifact mismatch one loud log line.
"""
import numpy as np
import pytest

import jax

from chatterbox_tpu.models.s3gen_ref import S3GenRefConfig, init_s3gen_ref_params
from chatterbox_tpu.models.s3gen_ref.schema import (
    s3gen_checkpoint_schema,
    synthesize_checkpoint,
)
from chatterbox_tpu.models.t3 import T3Config
from chatterbox_tpu.models.t3.model import init_t3_params
from chatterbox_tpu.models.voice_encoder import VoiceEncoderConfig, init_voice_encoder_params
from chatterbox_tpu.runtime.loader import convert_t3, convert_voice_encoder
from chatterbox_tpu.runtime.manifest import (
    build_full_manifest,
    diff_against_manifest,
    load_manifest,
    t3_checkpoint_schema,
    ve_checkpoint_schema,
)


def test_manifest_file_matches_code():
    """The checked-in JSON must equal what the schema code generates —
    any schema change requires re-running scripts/gen_manifest.py."""
    on_disk = load_manifest()
    assert on_disk is not None, "chatterbox_tpu/data/checkpoint_manifest.json missing"
    generated = build_full_manifest()
    assert set(on_disk) == set(generated)
    for name in generated:
        assert on_disk[name] == generated[name], f"{name} drifted; re-run scripts/gen_manifest.py"


def test_full_size_s3gen_conversion_clean():
    """The FULL-SIZE s3gen schema converts cleanly (zeros-filled: structure
    is under test, not values)."""
    cfg = S3GenRefConfig()
    raw = synthesize_checkpoint(s3gen_checkpoint_schema(cfg), zeros=True)
    from chatterbox_tpu.models.s3gen_ref.convert import convert_s3gen_ref

    params = init_s3gen_ref_params(jax.random.PRNGKey(0), cfg)
    result = convert_s3gen_ref(raw, params, cfg)
    assert result["mismatched"] == [], result["mismatched"][:10]
    assert result["missing"] == [], result["missing"][:10]
    assert result["unused"] == [], result["unused"][:10]


def test_full_size_t3_conversion_consumes_manifest():
    cfg = T3Config()
    schema = t3_checkpoint_schema(cfg)
    raw = {
        k: np.zeros(shape, np.float32) for k, shape in schema.items()
    }
    params = init_t3_params(jax.random.PRNGKey(0), cfg)
    used, report = set(), []
    convert_t3(raw, params, np.float32, used=used, report_out=report)
    assert report == [], report[:10]
    assert used == set(schema), sorted(set(schema) - used)[:10]


def test_full_size_ve_conversion_consumes_manifest():
    cfg = VoiceEncoderConfig()
    schema = ve_checkpoint_schema(cfg)
    raw = {k: np.zeros(shape, np.float32) for k, shape in schema.items()}
    params = init_voice_encoder_params(jax.random.PRNGKey(0), cfg)
    used, report = set(), []
    convert_voice_encoder(raw, params, np.float32, used=used, report_out=report)
    assert report == [], report[:10]
    assert used == set(schema), sorted(set(schema) - used)[:10]


def test_pos_emb_row_prefix_slice():
    """The real checkpoint's learned-position tables cover its training
    budgets (2050/4098 rows); conversion takes the row prefix."""
    cfg = T3Config.tiny()
    schema = t3_checkpoint_schema(cfg)  # checkpoint-side row counts
    rng = np.random.default_rng(3)
    raw = {k: rng.standard_normal(shape).astype(np.float32) for k, shape in schema.items()}
    params = init_t3_params(jax.random.PRNGKey(0), cfg)
    report = []
    out = convert_t3(raw, params, np.float32, report_out=report)
    assert report == [], report
    rows = cfg.max_text_tokens + 2
    np.testing.assert_allclose(
        np.asarray(out["text_pos"]), raw["text_pos_emb.emb.weight"][:rows]
    )
    rows = cfg.max_speech_tokens + 2
    np.testing.assert_allclose(
        np.asarray(out["speech_pos"]), raw["speech_pos_emb.emb.weight"][:rows]
    )


def test_diff_against_manifest_buckets():
    expected = {
        "a.weight": [4, 2],
        "b.weight_g": [4, 1, 1],
        "b.weight_v": [4, 2, 3],
        "gone.weight": [1],
    }
    actual = {
        "a.weight": (4, 2),
        # parametrized weight-norm spelling; original0 stored as flattened [4]
        "b.parametrizations.weight.original0": (4,),
        "b.parametrizations.weight.original1": (4, 2, 3),
        "tfmr.embed_tokens.weight": (8, 8),  # known-unmapped (unused by T3)
        "surprise.weight": (3,),             # genuinely unexpected
    }
    diff = diff_against_manifest(actual, expected)
    assert diff["unexpected"] == ["surprise.weight"]
    assert diff["missing"] == ["gone.weight"]
    assert diff["shape_mismatch"] == []
    assert diff["known_unmapped"] == ["tfmr.embed_tokens.weight"]

    bad = dict(actual)
    bad["a.weight"] = (4, 3)
    diff = diff_against_manifest(bad, expected)
    assert len(diff["shape_mismatch"]) == 1 and "a.weight" in diff["shape_mismatch"][0]
