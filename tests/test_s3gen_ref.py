"""Checkpoint-compatible S3Gen stack: forward sanity + op semantics vs torch.

The conversion schema itself is exercised in test_s3gen_ref_convert.py; here
we test the forward paths on tiny configs and cross-validate the
torch-semantics primitives (convs, group norm, transposed convs) that the
converters rely on.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen_ref import (
    S3GenRefConfig,
    init_s3gen_ref_params,
    s3gen_ref_embed_ref,
    s3gen_ref_inference,
    s3tok_ref_tokenize,
)
from chatterbox_tpu.models.s3gen_ref.campplus import campplus_embed
from chatterbox_tpu.models.s3gen_ref.features import hifigan_log_mel, kaldi_fbank, whisper_log_mel

CFG = S3GenRefConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_s3gen_ref_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def ref(params):
    rng = np.random.default_rng(1)
    wav24 = jnp.asarray(rng.standard_normal((1, 24000)) * 0.1, jnp.float32)
    wav16 = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
    return s3gen_ref_embed_ref(
        params, CFG, wav24, jnp.array([24000]), wav16, jnp.array([16000])
    )


# ------------------------------------------------------------------ features
def test_hifigan_mel_shape_and_rate():
    wav = jnp.zeros((2, 24000))
    mel = hifigan_log_mel(wav)
    assert mel.shape == (2, 50, 80)  # 50 fps
    assert np.allclose(np.asarray(mel), np.log(1e-5), atol=1e-4)  # silence → floor


def test_reflect_tail_matches_numpy_reflect_pad():
    """Padding past the valid length must equal numpy 'reflect' of the tail,
    so the last mel frame of a short prompt matches the reference extractor
    (which reflect-pads the TRUE-length waveform — ADVICE r2)."""
    from chatterbox_tpu.models.s3gen_ref.features import reflect_tail

    rng = np.random.default_rng(3)
    L, buf = 1003, 2048
    wav = rng.standard_normal(L).astype(np.float32)
    big = np.zeros((1, buf), np.float32)
    big[0, :L] = wav
    out = np.asarray(reflect_tail(jnp.asarray(big), jnp.array([L])))
    ref = np.pad(wav, (0, buf - L), mode="reflect")
    # single-reflection region is what the mel window can read: up to
    # (n_fft - hop)/2 = 720 samples past the valid end
    np.testing.assert_allclose(out[0, : L + 720], ref[: L + 720], rtol=0, atol=0)


def test_whisper_mel_shape():
    wav = jnp.zeros((1, 16000))
    mel, n = whisper_log_mel(wav, jnp.array([16000]))
    assert mel.shape == (1, 100, 128)
    assert int(n[0]) == 100


def test_kaldi_fbank_mean_normalised():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
    fb, n = kaldi_fbank(wav, jnp.array([16000]))
    assert fb.shape[2] == 80
    assert int(n[0]) == 1 + (16000 - 400) // 160
    valid = np.asarray(fb)[0, : int(n[0])]
    assert np.allclose(valid.mean(axis=0), 0.0, atol=1e-4)  # CMN


def test_kaldi_fbank_length_mask():
    """Padded samples must not affect the valid frames."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal(8000).astype(np.float32) * 0.1
    a = jnp.asarray(np.pad(w, (0, 8000))[None])
    b = jnp.asarray(np.pad(w, (0, 8000))[None]).at[:, 8000:].set(5.0)
    fa, na = kaldi_fbank(a, jnp.array([8000]))
    fb_, nb = kaldi_fbank(b, jnp.array([8000]))
    n = int(na[0])
    np.testing.assert_allclose(np.asarray(fa)[0, :n], np.asarray(fb_)[0, :n], atol=1e-5)


# ------------------------------------------------------------------ tokenizer
def test_tokenizer_range_and_determinism(params):
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    lens = jnp.array([16000, 8000])
    t1, n1 = s3tok_ref_tokenize(params["tokenizer"], CFG.tokenizer, wav, lens)
    t2, n2 = s3tok_ref_tokenize(params["tokenizer"], CFG.tokenizer, wav, lens)
    assert t1.shape == (2, 25)
    assert int(n1[0]) == 25 and int(n1[1]) == 12
    assert (np.asarray(t1) == np.asarray(t2)).all()
    assert (np.asarray(t1) >= 0).all() and (np.asarray(t1) < 6561).all()


def test_tokenizer_padding_invariance(params):
    """Tokens for the valid prefix must not depend on padding length."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal(8000).astype(np.float32) * 0.1
    a = jnp.asarray(np.pad(w, (0, 1600))[None])
    b = jnp.asarray(np.pad(w, (0, 8000))[None])
    ta, na = s3tok_ref_tokenize(params["tokenizer"], CFG.tokenizer, a, jnp.array([8000]))
    tb, nb = s3tok_ref_tokenize(params["tokenizer"], CFG.tokenizer, b, jnp.array([8000]))
    n = int(na[0])
    assert n == int(nb[0])
    assert (np.asarray(ta)[0, :n] == np.asarray(tb)[0, :n]).all()


# ------------------------------------------------------------------ campplus
def test_campplus_shape_and_mask(params):
    rng = np.random.default_rng(4)
    fb = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)
    valid = jnp.arange(120)[None, :] < jnp.array([[120], [60]])
    emb = campplus_embed(params["speaker"], CFG.speaker, fb, valid)
    assert emb.shape == (2, 192)
    # masked row must equal the same audio without padding
    emb2 = campplus_embed(params["speaker"], CFG.speaker, fb[1:, :60], None)
    np.testing.assert_allclose(np.asarray(emb)[1], np.asarray(emb2)[0], atol=2e-3)


# ------------------------------------------------------------------ inference
def test_embed_ref_fields(ref):
    assert ref["spk_emb"].shape == (1, 192)
    assert ref["prompt_tokens"].shape == (1, CFG.max_prompt_tokens)
    assert int(ref["prompt_len"][0]) == CFG.max_prompt_tokens  # 1 s → 25 tokens > budget 8
    assert ref["prompt_mel"].shape == (1, CFG.max_prompt_mel, 80)
    assert int(ref["prompt_mel_len"][0]) == CFG.max_prompt_mel


def test_inference_shapes_and_cache_contract(params, ref):
    T = 6
    spt = CFG.samples_per_token
    tokens = jnp.asarray(np.arange(T)[None] % 50, jnp.int32)
    tlen = jnp.array([T])
    src0 = jnp.zeros((1, T * spt))
    key = jax.random.PRNGKey(7)
    wav1, src1 = s3gen_ref_inference(params, CFG, tokens, tlen, ref, src0, jnp.array([0]), key)
    assert wav1.shape == (1, T * spt)
    assert src1.shape == (1, T * spt)
    assert np.isfinite(np.asarray(wav1)).all()

    # chunk continuity: re-synthesis with the cached source prefix reproduces
    # the prefix samples exactly (the reference cache_source contract)
    wav2, src2 = s3gen_ref_inference(params, CFG, tokens, tlen, ref, src1, jnp.array([3 * spt]), key)
    np.testing.assert_allclose(np.asarray(src2)[0, : 3 * spt], np.asarray(src1)[0, : 3 * spt], atol=1e-6)


def test_tail_vocode_exact(params, ref):
    """Windowed vocoding must reproduce the full computation's emitted tail
    EXACTLY (it is the scheduler's full-overlap fast path): margin =
    hift_receptive_margin, every op in hift_decode is local."""
    from chatterbox_tpu.models.s3gen_ref import s3gen_ref_inference_tail

    T = 64
    spt = CFG.samples_per_token
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, 50, (1, T)), jnp.int32)
    tlen = jnp.array([T])
    src0 = jnp.asarray(rng.standard_normal((1, T * spt)) * 0.05, jnp.float32)
    clen = jnp.array([10 * spt])
    key = jax.random.PRNGKey(9)
    wav_full, src_full = s3gen_ref_inference(params, CFG, tokens, tlen, ref, src0, clen, key)

    tail_len = 8 * spt
    for start in (0, 17 * spt + 5, T * spt - tail_len):
        tail, src_t = s3gen_ref_inference_tail(
            params, CFG, tokens, tlen, ref, src0, clen, key,
            jnp.array([start]), tail_len,
        )
        np.testing.assert_allclose(
            np.asarray(tail)[0], np.asarray(wav_full)[0, start : start + tail_len],
            rtol=0, atol=2e-6, err_msg=f"start={start}",
        )
        np.testing.assert_allclose(np.asarray(src_t), np.asarray(src_full), atol=0)


def test_hift_receptive_margin_full_size():
    """The analytic margin must hold for the FULL-SIZE HiFT config: vocoding
    a window reproduces interior samples of the full-length computation."""
    from chatterbox_tpu.models.s3gen_ref.config import HiFTConfig
    from chatterbox_tpu.models.s3gen_ref.hift import (
        _upsample_total,
        hift_decode,
        hift_receptive_margin,
        init_hift_params,
    )

    cfg = HiFTConfig()
    up = _upsample_total(cfg)                      # samples per mel frame
    margin = hift_receptive_margin(cfg)
    p = init_hift_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(11)
    F = 2 * (margin // up + 1) + 40                # window fits with interior
    mel = jnp.asarray(rng.standard_normal((1, F, 80)) * 0.3, jnp.float32)
    source = jnp.asarray(rng.standard_normal((1, F * up)) * 0.1, jnp.float32)
    full = np.asarray(hift_decode(p, cfg, mel, source))

    w0_f = 13                                      # unaligned-ish window start
    wf = F - 20
    win = np.asarray(
        hift_decode(p, cfg, mel[:, w0_f : w0_f + wf], source[:, w0_f * up : (w0_f + wf) * up])
    )
    lo = margin                                     # interior of the window
    hi = wf * up - margin
    assert hi - lo > up, "window too small for an interior region"
    np.testing.assert_allclose(
        win[0, lo:hi], full[0, w0_f * up + lo : w0_f * up + hi], rtol=0, atol=2e-6
    )


def test_inference_deterministic_per_key(params, ref):
    T = 4
    spt = CFG.samples_per_token
    tokens = jnp.asarray(np.arange(T)[None], jnp.int32)
    args = (tokens, jnp.array([T]), ref, jnp.zeros((1, T * spt)), jnp.array([0]))
    a, _ = s3gen_ref_inference(params, CFG, *args, jax.random.PRNGKey(1))
    b, _ = s3gen_ref_inference(params, CFG, *args, jax.random.PRNGKey(1))
    c, _ = s3gen_ref_inference(params, CFG, *args, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert not np.allclose(np.asarray(a), np.asarray(c))


# --------------------------------------------------- torch semantics parity
torch = pytest.importorskip("torch")


def test_conv1d_matches_torch():
    from chatterbox_tpu.ops.conv import conv1d

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)
    w = rng.standard_normal((3, 8, 16)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    for stride, dil in ((1, 1), (2, 1), (1, 2)):
        # SAME_TORCH == torch's symmetric padding for every stride; plain XLA
        # "SAME" right-biases the pad when stride > 1
        ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, dilation=dil, padding="SAME_TORCH"))
        theirs = torch.nn.functional.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(2, 1, 0)),
            torch.from_numpy(b),
            stride=stride, dilation=dil, padding=(3 - 1) // 2 * dil,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv_transpose1d_matches_torch():
    from chatterbox_tpu.ops.conv import conv_transpose1d

    rng = np.random.default_rng(1)
    for k, s in ((16, 8), (11, 5), (7, 3)):
        x = rng.standard_normal((1, 12, 6)).astype(np.float32)
        w = rng.standard_normal((k, 6, 4)).astype(np.float32)
        ours = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w), stride=s))
        theirs = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(1, 2, 0)),  # [in, out, k]
            stride=s, padding=(k - s) // 2,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_group_norm_matches_torch():
    from chatterbox_tpu.models.s3gen_ref.decoder import _group_norm

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ours = np.asarray(_group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), groups=8))
    theirs = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 2, 1)), 8, torch.from_numpy(w), torch.from_numpy(b)
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_batch_norm_matches_torch():
    from chatterbox_tpu.models.s3gen_ref.campplus import _bn

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 10, 6)).astype(np.float32)
    p = {
        "mean": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
        "var": jnp.asarray(np.abs(rng.standard_normal(6)).astype(np.float32) + 0.5),
        "w": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
    }
    ours = np.asarray(_bn(jnp.asarray(x), p))
    theirs = torch.nn.functional.batch_norm(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(np.asarray(p["mean"])), torch.from_numpy(np.asarray(p["var"])),
        torch.from_numpy(np.asarray(p["w"])), torch.from_numpy(np.asarray(p["b"])),
        training=False,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_rel_pos_attention_matches_espnet_shift():
    """Our gather-based bd term == the ESPnet pad-and-shift implementation."""
    from chatterbox_tpu.models.s3gen_ref.upsample_encoder import _rel_pos_table

    rng = np.random.default_rng(4)
    T, H, dk = 7, 2, 4
    qv = rng.standard_normal((1, T, H, dk)).astype(np.float32)
    table = _rel_pos_table(T, H * dk)  # [2T-1, D]
    # pos_proj: identity reshape (proj = I) for the comparison
    pos_proj = table.reshape(2 * T - 1, H, dk)

    # ours: bd[i, j] = qv[i] · pos_proj[(T-1) + (i - j)]
    rel_idx = (T - 1) + (np.arange(T)[:, None] - np.arange(T)[None, :])
    bd_ours = np.einsum("bihd,khd->bhik", qv, pos_proj)
    bd_ours = np.take_along_axis(bd_ours, rel_idx[None, None], axis=-1)

    # espnet: table is stored ascending in r; espnet's pos_emb is descending
    # (index 0 ↔ r = T-1), so flip before the matmul + rel_shift
    p = torch.from_numpy(pos_proj[::-1].copy()).permute(1, 0, 2)  # [H, 2T-1, dk]
    q = torch.from_numpy(qv).permute(0, 2, 1, 3)                  # [1, H, T, dk]
    bd_full = torch.matmul(q, p.unsqueeze(0).transpose(-2, -1))   # [1, H, T, 2T-1]
    zero_pad = torch.zeros((1, H, T, 1))
    x_padded = torch.cat([zero_pad, bd_full], dim=-1)
    x_padded = x_padded.view(1, H, 2 * T, T)
    bd_espnet = x_padded[:, :, 1:].view(1, H, T, 2 * T - 1)[:, :, :, :T]
    np.testing.assert_allclose(bd_ours, bd_espnet.numpy(), atol=1e-5)
