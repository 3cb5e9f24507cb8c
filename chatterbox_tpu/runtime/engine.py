"""TTSEngine: the streaming synthesis pipeline.

Replaces the reference's per-GPU worker engine
(/root/reference/src/tts_streaming.py — TextToSpeechEngine) with a TPU-native
design (SURVEY.md §7):

* models live HBM-resident in ONE process; no ZMQ/pickle hop;
* the T3 producer calls a jitted decode-slice graph (N tokens per host
  dispatch, on-device sampling) instead of a per-token generator;
* each S3Gen chunk (encoder + CFM Euler scan + vocoder) is a single jitted
  graph, bucketed by accumulated token count to bound recompiles;
* stage overlap comes from asyncio tasks joined by bounded queues — the JAX
  dispatch queue plays the role the reference gives CUDA streams;
* crossfade/trim/PCM stay on host (numpy; the arrays are ≤ seconds of audio).

The public surface mirrors the reference engine: ``ainit``, ``stream``,
``prepare_conditionals``, ``clear_voice_cache``, ``get_initialization_status``,
``shutdown`` (tts_streaming.py:198-355, 815-968).
"""
from __future__ import annotations

import asyncio
import dataclasses
import functools
import math
import os
import time
from enum import Enum
from pathlib import Path
from typing import AsyncGenerator, Dict, Literal, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..audio.crossfade import CrossfadeStitcher, trim_leading, trim_trailing
from ..audio.encoding import AudioEncoder
from ..audio.pcm import float_to_pcm16, read_wav, resample
from ..config import get_settings, get_tts_config
from ..logging_config import log
from ..models.s3gen import S3GenConfig, init_s3gen_params, s3gen_embed_ref, s3gen_inference
from ..models.s3gen_ref import (
    S3GenRefConfig,
    init_s3gen_ref_params,
    init_s3gen_stream_state,
    s3gen_ref_embed_ref,
    s3gen_ref_inference,
    s3gen_ref_inference_streaming,
    s3gen_ref_inference_tail,
    s3gen_ref_prompt_prefill,
    s3tok_ref_tokenize,
)
from ..models.s3tok import S3TokConfig, init_s3tok_params, s3tok_tokenize
from ..models.t3 import (
    T3Config,
    cond_embeddings,
    init_t3_params,
    make_decode_state,
    t3_decode_slice,
    t3_prefill,
)
from ..models.tokenizer import TextTokenizer
from ..models.voice_encoder import VoiceEncoderConfig, init_voice_encoder_params, voice_embed
from ..ops.spectral import log_mel_spectrogram
from ..serve.voice_manager import VoiceManager
from ..text import split_text_into_chunks
from .cancellation import CancellationToken, race_cancellation

S3_SR = 16000
S3GEN_SR = 24000


class InitializationState(Enum):
    NOT_STARTED = "not_started"
    INITIALIZING = "initializing"
    READY = "ready"
    ERROR = "error"


@dataclasses.dataclass
class Conditionals:
    """Voice conditioning: T3 lanes + S3Gen ref dict (HBM-resident, cached
    per voice_id — reference Conditionals, tts_streaming.py:106-118).

    The CFM prompt context (CHATTERBOX_CFM_PROMPT_CACHE) is deliberately NOT
    stored here: at ~1.1 GB per voice (full size, bf16) it rides a separate
    LRU keyed by voice_id (engine._cfm_cache_for) built lazily at first
    request — warm_up_voices prepares EVERY stored voice, which would OOM
    HBM if each carried a context."""

    t3_cond_lanes: jnp.ndarray  # [2, C, D]: (cond, uncond) prefix embeddings
    gen_ref: Dict               # s3gen ref dict


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    t3: T3Config
    s3gen: S3GenConfig
    s3tok: S3TokConfig
    ve: VoiceEncoderConfig
    text_bucket: int = 16       # pad text token counts to multiples of this
    max_new_tokens: int = 1000  # reference decode cap (tts_streaming.py:423)
    param_dtype: str = "float32"
    # Token-to-waveform architecture:
    #   "ref" — checkpoint-compatible reference stack (models/s3gen_ref):
    #           loads the pretrained s3gen.safetensors voices 1:1.
    #   "dit" — TPU-first DiT redesign (models/s3gen): faster, but needs its
    #           own (retrained/distilled) weights for real voices.
    s3gen_arch: str = "dit"
    s3gen_ref: Optional[S3GenRefConfig] = None

    @property
    def gen(self):
        """The active token-to-waveform config (sample_rate/samples_per_token
        surface is identical across architectures)."""
        return self.s3gen_ref if self.s3gen_arch == "ref" else self.s3gen

    @staticmethod
    def tiny() -> "EngineConfig":
        return EngineConfig(
            t3=T3Config.tiny(),
            s3gen=S3GenConfig.tiny(),
            s3tok=S3TokConfig.tiny(),
            ve=VoiceEncoderConfig.tiny(),
            text_bucket=8,
            max_new_tokens=64,
        )

    @staticmethod
    def tiny_ref() -> "EngineConfig":
        # env knobs applied here too so scripts/quality_study.py --tiny
        # exercises the same knob plumbing as the full model
        return dataclasses.replace(
            EngineConfig.tiny(),
            s3gen_arch="ref",
            s3gen_ref=EngineConfig._apply_ref_env_knobs(S3GenRefConfig.tiny()),
        )

    @staticmethod
    def _apply_ref_env_knobs(ref_cfg: "S3GenRefConfig") -> "S3GenRefConfig":
        """Deliberate TPU-serving deviations (off by default, quality deltas
        quantified by scripts/quality_study.py):

        * CHATTERBOX_FLOW_PROMPT_TOKENS trims the flow's per-chunk prompt
          window (reference default: 10 s = 250 tokens / 500 mel frames,
          tts_streaming.py:365-366). Every chunk re-encodes this window, so
          it sets the flow's compute floor.
        * CHATTERBOX_CFM_STEPS trims the CFM Euler step count (reference:
          10). The estimator scan is ~72% of the S3Gen chunk, near-linear in
          steps."""
        ptoks = int(os.environ.get("CHATTERBOX_FLOW_PROMPT_TOKENS", "0") or 0)
        if 0 < ptoks < ref_cfg.max_prompt_tokens:
            ref_cfg = dataclasses.replace(
                ref_cfg, max_prompt_tokens=ptoks, max_prompt_mel=2 * ptoks
            )
        steps = int(os.environ.get("CHATTERBOX_CFM_STEPS", "0") or 0)
        if 0 < steps != ref_cfg.flow.n_timesteps:
            ref_cfg = dataclasses.replace(
                ref_cfg, flow=dataclasses.replace(ref_cfg.flow, n_timesteps=steps)
            )
        # CHATTERBOX_FLOW_BF16=1 keeps encoder/CFM activations in the
        # weights' dtype (bf16 full-size) instead of the accidental-f32
        # chain; see FlowRefConfig.bf16_activations for the precision
        # contract. HiFT stays f32 (model.py pins the mel handoff).
        if os.environ.get("CHATTERBOX_FLOW_BF16", "0") == "1":
            ref_cfg = dataclasses.replace(
                ref_cfg, flow=dataclasses.replace(ref_cfg.flow, bf16_activations=True)
            )
        return ref_cfg

    @staticmethod
    def full(param_dtype: str = "bfloat16") -> "EngineConfig":
        arch = os.environ.get("CHATTERBOX_S3GEN_ARCH", "ref")
        ref_cfg = None
        if arch == "ref":
            ref_cfg = EngineConfig._apply_ref_env_knobs(S3GenRefConfig())
        # int8 KV cache is the serving default: with the scale-factored
        # attention (scales applied to scores/probs, cache fed to the matmul
        # as int8) the 35-token batched slice measures 500 ms vs 679 ms bf16
        # at 16 slots, and cache memory halves. CHATTERBOX_KV=native reverts.
        kv = os.environ.get("CHATTERBOX_KV", "int8")
        # decode cap per text chunk (reference: 1000 — tts_streaming.py:423).
        # CHATTERBOX_MAX_NEW_TOKENS trims it, e.g. for load tests with
        # random weights where no natural EOS ever fires.
        cap = int(os.environ.get("CHATTERBOX_MAX_NEW_TOKENS", "1000"))
        return EngineConfig(
            t3=T3Config().with_(kv_cache_dtype=kv),
            s3gen=S3GenConfig(),
            s3tok=S3TokConfig(),
            ve=VoiceEncoderConfig(),
            param_dtype=param_dtype,
            s3gen_arch=arch,
            s3gen_ref=ref_cfg,
            max_new_tokens=max(8, min(cap, 1000)),
        )


def _bucket(n: int, step: int, cap: int) -> int:
    return min(cap, max(step, int(math.ceil(n / step)) * step))


def _pallas_active() -> bool:
    from ..ops.pallas_attention_v3 import pallas_enabled

    return pallas_enabled() and jax.default_backend() == "tpu"


def _stable_seed(request_id: str) -> int:
    """Process-independent seed from a request id (Python's hash() is salted
    per process, which would make synthesis irreproducible across runs)."""
    import zlib

    return zlib.crc32(request_id.encode()) & 0x7FFFFFFF


def _queue_put_final(q: asyncio.Queue, item) -> None:
    """Best-effort non-blocking sentinel put (drops one stale entry if full)."""
    try:
        q.put_nowait(item)
    except asyncio.QueueFull:
        try:
            q.get_nowait()
            q.put_nowait(item)
        except Exception:
            pass
    except Exception:
        pass


# Public API knob `audio_tokens_per_slice` is snapped server-side to this set
# so every reachable shape is precompiled (a free-form int would otherwise
# compile a fresh S3Gen bucket ladder at request time — ~10 s stalls;
# VERDICT r1 item 8). Deliberate deviation: the reference accepts any int.
SLICE_SIZE_SNAP = (8, 16, 25, 35, 50, 70, 100)


def _snap_slice_size(requested: int, cap: int) -> int:
    requested = max(1, min(requested, cap))
    snapped = min(SLICE_SIZE_SNAP, key=lambda s: (abs(s - requested), s))
    return max(1, min(snapped, cap))


def _lookahead_size(slice_size: int) -> int:
    """First-slice look-ahead: emit the first token group early so S3Gen
    starts sooner (reference: max(3, 0.2·slice) — tts_streaming.py:499-501)."""
    return max(3, -(-slice_size // 5))


# Largest progressive slice: must stay below MAX_TAIL_TOKENS (the emitted
# tail window) and inside the streaming block ladder (s3gen_scheduler.
# STREAM_BLOCK_SNAP covers new_len ≤ 101), so 100 — the SLICE_SIZE_SNAP top.
PROGRESSIVE_SLICE_CAP = 100


def _progressive_enabled() -> bool:
    """CHATTERBOX_PROGRESSIVE_SLICES=1: in full-overlap streaming mode, later
    slices grow (s → 2s → … capped at 100 tokens) once the playback buffer is
    ahead. DELIBERATE DEVIATION from the reference's fixed per-request
    audio_tokens_per_slice (/root/reference/src/tts_streaming.py:423): larger
    late slices halve the per-wave S3Gen call count (per-call fixed dispatch
    cost is the measured full-mode capacity tax) without touching TTFA — the
    first two slices keep the reference cadence."""
    return os.environ.get("CHATTERBOX_PROGRESSIVE_SLICES", "0") == "1"


def _next_slice_target(cur: int, slice_size: int, cap: int) -> int:
    """Next progressive slice size: double, snap to the compiled ladder,
    never shrink, cap at PROGRESSIVE_SLICE_CAP."""
    nxt = _snap_slice_size(cur * 2, cap)
    return min(max(nxt, cur, slice_size), PROGRESSIVE_SLICE_CAP)


def _token_bucket_sizes(slice_size: int, cap: int):
    """Buckets for the accumulated-token axis: an exact-fit first bucket for
    the slice size, then a doubling ladder SHARED across all slice sizes
    (32, 64, ... cap) so most S3Gen graph shapes are reused between
    requests with different audio_tokens_per_slice."""
    sizes = [min(slice_size, cap)]
    b = 32
    while b < cap:
        if b > sizes[-1]:
            sizes.append(b)
        b *= 2
    if sizes[-1] < cap:
        sizes.append(cap)
    return sizes


def ensure_backend_initialized() -> None:
    """Force JAX backend initialization on the CALLING (main) thread.

    The tunneled TPU runtime initializes per-process state tied to the thread
    that first touches the device; if that first touch happens from a worker
    thread while an asyncio loop runs on the main thread, every subsequent
    blocking device wait takes ~20 s. Touch the device here, on the main
    thread, before starting any event loop. (Found empirically; see
    .claude/skills/verify/SKILL.md gotchas.)
    """
    import numpy as _np

    _np.asarray(jnp.zeros((1,)))


class TTSEngine:
    ENC_COND_LEN = 6 * S3_SR       # tokenizer prompt budget (reference :167)
    DEC_COND_LEN = 10 * S3GEN_SR   # embed_ref budget (reference :168)
    DEC16_COND_LEN = 10 * S3_SR    # 16 kHz view of the embed_ref budget

    def __init__(self, engine_cfg: Optional[EngineConfig] = None, seed: int = 0):
        settings = get_settings()
        if engine_cfg is None:
            if os.environ.get("CHATTERBOX_TINY_MODEL"):
                if os.environ.get("CHATTERBOX_S3GEN_ARCH", "dit") == "ref":
                    engine_cfg = EngineConfig.tiny_ref()
                else:
                    engine_cfg = EngineConfig.tiny()
            else:
                engine_cfg = EngineConfig.full(settings.DTYPE_POLICY)
            # the env-level KV dtype override applies only to configs the
            # engine constructed itself; an explicitly injected engine_cfg is
            # the caller's contract and is never silently rewritten (ADVICE r2)
            if settings.KV_CACHE_DTYPE != "native":
                engine_cfg = dataclasses.replace(
                    engine_cfg,
                    t3=engine_cfg.t3.with_(kv_cache_dtype=settings.KV_CACHE_DTYPE),
                )
        if (
            _pallas_active()
            and engine_cfg.t3.kv_cache_layout == "seq"
            and engine_cfg.t3.num_kv_heads % 2 == 0
        ):
            # head-paired KV layout → grid-bounded decode attention
            # (ops/pallas_attention_v3.py): reads only the filled cache
            # prefix. Composes with the int8 serving default — the kernel
            # dequantizes in-kernel via scale-factoring, so the paired int8
            # cache DMAs half the bytes of the bf16 one.
            engine_cfg = dataclasses.replace(
                engine_cfg, t3=engine_cfg.t3.with_(kv_cache_layout="paired")
            )
        self.cfg = engine_cfg
        self.seed = seed
        self.gen_cfg = engine_cfg.gen  # active token→waveform config
        self.sr = self.gen_cfg.sample_rate
        self.voice_manager = VoiceManager()
        self.voice_cache: Dict[str, Conditionals] = {}
        self.params: Optional[Dict] = None
        self.tokenizer: Optional[TextTokenizer] = None
        self._state = InitializationState.NOT_STARTED
        self._progress = ""
        self._error: Optional[str] = None
        # 0 = auto: admit as many concurrent requests as there are decode
        # slots, so the continuous-batching scheduler actually batches out of
        # the box (documented deviation from the reference's 1 — config.py)
        concurrency = settings.CONCURRENT_REQUESTS_PER_WORKER or max(
            1, settings.MAX_DECODE_SLOTS
        )
        self.tts_semaphore = asyncio.Semaphore(concurrency)
        # "full"-overlap re-synthesis window in tokens (0 = reference
        # behavior: re-synthesize the whole accumulated stream every slice)
        self.overlap_window = int(
            os.environ.get("CHATTERBOX_OVERLAP_WINDOW_TOKENS", "0") or 0
        )
        self._jit_cache: Dict = {}
        # voice_id → frozen CFM prompt context, LRU-bounded (_cfm_cache_for)
        from collections import OrderedDict

        self._cfm_cache_lru: "OrderedDict[str, Dict]" = OrderedDict()
        self.decoder = None  # BatchedT3Decoder when MAX_DECODE_SLOTS > 1
        self.s3gen_scheduler = None  # S3GenScheduler (micro-batching), same gate
        # per-request fatal pipeline errors, surfaced to the HTTP layer
        # (the reference leaves this as a TODO — worker.py:54-56)
        self._request_errors: Dict[str, str] = {}
        self._precompile_task: Optional[asyncio.Task] = None

    # ------------------------------------------------------------------ init
    def get_initialization_status(self) -> dict:
        return {"state": self._state.value, "progress": self._progress, "error": self._error}

    def shutdown(self) -> None:
        log.info("Engine shutdown: releasing device buffers.")
        if self.decoder is not None:
            self.decoder.stop()
            self.decoder = None
        if self.s3gen_scheduler is not None:
            self.s3gen_scheduler.stop()
            self.s3gen_scheduler = None
        self.params = None
        self.voice_cache.clear()
        self._cfm_cache_lru.clear()
        self._jit_cache.clear()

    async def ainit(self) -> None:
        try:
            # to_thread tasks here are device-wait-bound, not CPU-bound: one
            # decode slice + per-stream S3Gen dispatches + stream emitters all
            # block in tunnel round-trips concurrently. The default executor
            # sizes by CPU count (min(32, cpus+4) = 5 workers on a 1-CPU
            # tunnel host), so dispatches QUEUE behind each other — measured
            # r3: decode slices waited ~49 s for a worker while S3Gen
            # first-call traces held the pool. Size for in-flight device
            # waits, not cores.
            import concurrent.futures

            asyncio.get_running_loop().set_default_executor(
                concurrent.futures.ThreadPoolExecutor(
                    max_workers=64, thread_name_prefix="chatterbox-io"
                )
            )
            self._state = InitializationState.INITIALIZING
            self._progress = "Initializing models..."
            await asyncio.to_thread(self._init_models)
            settings = get_settings()
            if settings.MAX_DECODE_SLOTS > 1:
                from .s3gen_scheduler import S3GenScheduler
                from .scheduler import BatchedT3Decoder

                self.decoder = BatchedT3Decoder(
                    self.params["t3"],
                    self.cfg.t3,
                    n_slots=settings.MAX_DECODE_SLOTS,
                    slice_size=get_tts_config().AUDIO_TOKENS_PER_SLICE,
                    seed=self.seed,
                )
                from .s3gen_scheduler import MAX_TAIL_TOKENS

                # state row must hold the largest bucket PLUS the largest
                # per-slice window shift (≤ slice+EOS ≤ MAX_TAIL_TOKENS):
                # synthesize() clamps shift to state_len − bucket·spt, and a
                # clamped shift would silently misalign the excitation cache
                self.s3gen_scheduler = S3GenScheduler(
                    self.params["s3gen"], self.gen_cfg, infer=self._s3gen_infer_fn(),
                    state_tokens=self._reachable_token_cap() + MAX_TAIL_TOKENS,
                    tail_infer=self._s3gen_tail_infer_fn(),
                    stream_infer=self._s3gen_stream_infer_fn(),
                )
                # first-audio priority: after a fresh slot's first tokens, the
                # decode loop lets the request's first S3Gen dispatch enqueue
                # ahead of the next decode slice (see scheduler.py).
                # CHATTERBOX_FIRST_AUDIO_GATE: "0" disables (A/B for the
                # admission-churn cost — serve_bench.py --churn); a float sets
                # the bounded wait in seconds (default 0.25).
                gate_env = os.environ.get("CHATTERBOX_FIRST_AUDIO_GATE", "1")
                if gate_env != "0":
                    timeout = 0.25 if gate_env == "1" else float(gate_env)
                    self.decoder.first_audio_gate = functools.partial(
                        self.s3gen_scheduler.wait_dispatch, timeout=timeout
                    )
            self._progress = "Warming up compiled graphs..."
            await asyncio.to_thread(self._warmup)
            if self.decoder is not None:
                await self._warmup_decoder()
            self._state = InitializationState.READY
            self._progress = "Model ready"
            log.info("Engine ready on %s", jax.devices()[0])
            if os.environ.get("CHATTERBOX_PRECOMPILE", "1") == "1":
                # kept as an attribute so benchmarks can await completion:
                # background compiles contend for the host CPU and would
                # otherwise bleed into measured waves (BENCH_NOTES r3)
                self._precompile_task = asyncio.ensure_future(self._precompile())
        except Exception as exc:  # pragma: no cover - defensive
            self._state = InitializationState.ERROR
            self._error = str(exc)
            self._progress = f"Failed: {exc}"
            log.exception("Engine initialization failed")
            raise

    def _reachable_token_cap(self) -> int:
        """Largest accumulated-token count one text chunk can feed S3Gen:
        per-chunk decode stops at ``max_new_tokens`` (+1 appended EOS code).
        Precompiling the ladder past this wastes minutes per unreachable
        (bucket, batch) variant on this 1-CPU host (trace+lower dominates)."""
        return min(self.cfg.t3.max_speech_tokens + 8, self.cfg.max_new_tokens + 2)

    def _reachable_view_cap(self, depth: int, slice_size: int) -> int:
        """Largest 256-aligned attention view the serving path can request:
        position ≤ prefill end + per-chunk decode cap, +slice overshoot."""
        t3c = self.cfg.t3
        pos_cap = (
            t3c.cond_len + t3c.max_text_tokens + 1
            + min(t3c.max_speech_tokens, self.cfg.max_new_tokens + 1)
            + slice_size + 1
        )
        return min(depth, ((pos_cap + 255) // 256) * 256)

    def _precompile_plan(self) -> Dict[str, list]:
        """Every jit variant the serving path can request, enumerated with
        the SAME helpers the live path uses (snap/bucket/look-ahead/view
        formulas). tests/test_precompile_plan.py simulates live demand and
        asserts it is a subset of this plan — a variant missing here stalls
        first traffic for its compile instead (measured r3: minutes-long
        batched-S3Gen and ~12 s/view decode compiles mid-wave).

        Keys: ``s3gen`` [T...], ``s3gen_batched`` [(T, B)...],
        ``s3gen_stream`` [(T, B, new_block)...], ``decode``
        [(n_steps, s_view)...], ``insert`` [T_pad...]."""
        tts_cfg = get_tts_config()
        slice_size = max(1, min(tts_cfg.AUDIO_TOKENS_PER_SLICE, self.cfg.max_new_tokens))
        t3c = self.cfg.t3
        cap = self._reachable_token_cap()
        # CHATTERBOX_PRECOMPILE_SLICES="35" (comma-separated) restricts the
        # plan to those snapped slice sizes. Benchmarks pin the one slice size
        # they exercise: the full 7-slice plan's exotic ladders cost hours of
        # single-CPU compile and ~100 GB of retained compile arenas (measured:
        # the r5 full-plan precompile OOM-walked a 125 GB host), while any
        # slice missing here merely compiles at request time.
        snap_set: tuple = SLICE_SIZE_SNAP
        env_slices = os.environ.get("CHATTERBOX_PRECOMPILE_SLICES")
        if env_slices:
            wanted = {int(x) for x in env_slices.split(",") if x.strip()}
            snap_set = tuple(s for s in SLICE_SIZE_SNAP if s in wanted) or SLICE_SIZE_SNAP
        # every bucket reachable through the snapped slice-size knob:
        # per-size exact-fit first buckets + the shared doubling ladder
        buckets: list = []
        for s in sorted({_snap_slice_size(s, self.cfg.max_new_tokens) for s in snap_set}):
            for b in _token_bucket_sizes(s, cap):
                if b not in buckets:
                    buckets.append(b)
        # compile order = likely-use order (background compiles race first
        # traffic): the DEFAULT slice size's ladder first, exotic
        # audio_tokens_per_slice buckets last
        default_ladder = _token_bucket_sizes(slice_size, cap)
        ordered = [b for b in default_ladder if b in buckets]
        ordered += [b for b in sorted(buckets) if b not in ordered]
        plan: Dict[str, list] = {
            "s3gen": ordered,
            "s3gen_batched": [],
            "s3gen_stream": [],
            "decode": [],
            "insert": [],
        }
        if self.s3gen_scheduler is not None:
            stream_on = getattr(self.s3gen_scheduler, "_stream_infer", None) is not None
            # with streaming active, full-overlap traffic rides the stream
            # graphs at EVERY accumulated bucket; the plain (re-solve) graphs
            # stay reachable only through zero-overlap slices, whose counts
            # never exceed slice+EOS — enumerate those buckets with the same
            # formula the producer uses
            resolve_T = set(plan["s3gen"])
            stream_nb: Dict[int, set] = {}
            if stream_on:
                from .s3gen_scheduler import (
                    STREAM_BLOCK_SNAP,
                    stream_block_tokens,
                )

                resolve_T = set()
                for s in sorted({
                    _snap_slice_size(s, self.cfg.max_new_tokens)
                    for s in snap_set
                }):
                    bl = _token_bucket_sizes(s, cap)
                    for c in range(3, min(s + 1, cap) + 1):
                        t = next((b for b in bl if b >= c), None)
                        if t is not None:
                            resolve_T.add(t)
                    # stream dispatch sizes the static block to the batch's
                    # max new_len (≤ slice + EOS); batches of short first
                    # slices pick SMALLER snap blocks, so cover every block
                    # up to the slice's own. Progressive slicing grows late
                    # slices to PROGRESSIVE_SLICE_CAP — cover its whole ladder
                    top = (max(s, PROGRESSIVE_SLICE_CAP)
                           if _progressive_enabled() else s)
                    nb_cap = stream_block_tokens(top + 1, 10**9)
                    for t in bl:
                        stream_nb.setdefault(t, set()).update(
                            min(nb, t) for nb in STREAM_BLOCK_SNAP
                            if nb <= nb_cap
                        )
            # every power-of-two batch the scheduler's coalescing can form
            # at each bucket (bounded by the token-product HBM budget)
            for T in plan["s3gen"]:
                b = 1
                while b <= self.s3gen_scheduler.allowed_batch(T):
                    if T in resolve_T:
                        plan["s3gen_batched"].append((T, b))
                    for nb in sorted(stream_nb.get(T, ())):
                        plan["s3gen_stream"].append((T, b, nb))
                    b *= 2
        if self.decoder is not None:
            from .scheduler import LOOKAHEAD_STEPS

            dec_slice = self.decoder.slice_size
            if t3c.kv_cache_layout == "paired":
                view_cap = self._reachable_view_cap(t3c.max_seq_len, dec_slice)
                views = sorted(
                    {min(t3c.max_seq_len, v) for v in range(256, view_cap + 1, 256)}
                )
            else:
                views = [None]
            lengths = sorted({dec_slice} | set(LOOKAHEAD_STEPS))
            plan["decode"] = [(n, v) for v in views for n in lengths]
            # prefill-insert variants: one per reachable text bucket
            # (compiled live these cost ~15 s each mid-wave)
            plan["insert"] = [
                _bucket(t, self.cfg.text_bucket, t3c.max_text_tokens)
                for t in range(1, t3c.max_text_tokens + 1, self.cfg.text_bucket)
            ]
            plan["insert"] = sorted(set(plan["insert"]))
        else:
            # single-slot serving path: decode views for the smallest text
            # bucket only (the common case; per-request cache depth varies
            # with the text bucket, so full coverage is combinatorial)
            depth = t3c.cond_len + self.cfg.text_bucket + 1 + t3c.max_speech_tokens
            if t3c.kv_cache_layout == "paired":
                view_cap = self._reachable_view_cap(depth, slice_size)
                views = sorted({min(depth, v) for v in range(256, view_cap + 1, 256)})
            else:
                views = [None]
            n_steps = set()
            for s in snap_set:
                s = _snap_slice_size(s, self.cfg.max_new_tokens)
                n_steps.add(s)
                n_steps.add(min(_lookahead_size(s), self.cfg.max_new_tokens))
            plan["decode"] = [(n, v) for v in views for n in sorted(n_steps)]
        return plan

    async def _precompile(self) -> None:
        """Background-warm every graph variant in _precompile_plan with one
        REAL dispatch each (dummy zero inputs). A real dispatch populates the
        jit DISPATCH cache in addition to the persistent XLA cache —
        lower().compile() fills only the latter, so first traffic re-traced
        every variant (~10-60 s of single-CPU host work each) and the
        re-traces starved the small default thread pool into ~49 s/slice
        decode walls (measured, r3 serving wave). Decode/insert warms are
        serialized with live traffic through the decoder loop
        (BatchedT3Decoder.warm_variants); S3Gen infer fns donate nothing and
        are safe to warm concurrently with traffic."""
        shape_of = lambda tree: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
        )
        t3c = self.cfg.t3
        s3c = self.gen_cfg
        spt = s3c.samples_per_token
        compiled = 0
        try:
            plan = self._precompile_plan()
            total = (
                len(plan["decode"]) + len(plan["insert"])
                + len(plan["s3gen_batched"]) + len(plan["s3gen_stream"])
                + (len(plan["s3gen"]) if self.s3gen_scheduler is None else 0)
            )
            t_pre0 = time.monotonic()
            last_tick = [t_pre0]

            def tick(done: int) -> None:
                # heartbeat ≤1/min: a multi-hour blind precompile is
                # indistinguishable from a hang (r5 operational finding)
                now = time.monotonic()
                if now - last_tick[0] >= 60 or done == total:
                    last_tick[0] = now
                    log.info(
                        "precompile: %d/%d variants (%.0f s)",
                        done, total, now - t_pre0,
                    )
            conds = self.voice_cache["default"]
            cfm_cache = await asyncio.to_thread(
                self._cfm_cache_for, "default", conds
            )
            params_shapes = shape_of(self.params)
            batched_by_T: Dict[int, list] = {}
            for T, Bv in plan["s3gen_batched"]:
                batched_by_T.setdefault(T, []).append(Bv)
            stream_by_T: Dict[int, list] = {}
            for T, Bv, nb in plan["s3gen_stream"]:
                stream_by_T.setdefault(T, []).append((Bv, nb))
            stream0 = None
            if stream_by_T and cfm_cache is not None:
                stream0 = await asyncio.to_thread(
                    self._stream_state0, "default", cfm_cache
                )
            # decode slices + prefill inserts first: they are cheap to build
            # and on EVERY request's critical path; the S3Gen bucket ladder
            # (minutes per big batched variant) follows
            if self.decoder is not None:
                await self.decoder.warm_variants(
                    plan["decode"], plan["insert"], conds.t3_cond_lanes
                )
                compiled += len(plan["decode"]) + len(plan["insert"])
                tick(compiled)
            for T in plan["s3gen"]:
                # the unbatched _jit_s3gen is only dispatched on the
                # decoder-less single-slot path — in scheduler mode every
                # request rides _infer_fn(T, B); warming the unbatched ladder
                # there would double precompile wall for executables that
                # never run (r3 review finding)
                if self.s3gen_scheduler is None:
                    def warm_bucket(T=T):
                        w, _ = self._jit_s3gen()(
                            self.params["s3gen"],
                            jnp.zeros((1, T), jnp.int32),
                            jnp.full((1,), T, jnp.int32),
                            conds.gen_ref,
                            jnp.zeros((1, T * spt), jnp.float32),
                            jnp.zeros((1,), jnp.int32),
                            jax.random.PRNGKey(0),
                            cfm_cache,
                        )
                        jax.block_until_ready(w)

                    try:
                        await asyncio.to_thread(warm_bucket)
                        compiled += 1
                        tick(compiled)
                    except Exception as exc:
                        log.warning("precompile: S3Gen bucket %d failed (%s)", T, exc)
                # micro-batched (vmapped) variants: first concurrent traffic
                # otherwise stalls ~10 s per (bucket, batch) combination
                if self.s3gen_scheduler is not None:
                    state_len = self.s3gen_scheduler.state_len
                    for Bv in sorted(batched_by_T.get(T, [])):
                        if Bv > self.s3gen_scheduler.allowed_batch(T):
                            break  # a ban earlier in this loop shrank the cap
                        def warm_batched(T=T, Bv=Bv):
                            rB = jax.tree.map(
                                lambda x: jnp.stack([x] * Bv, 0), conds.gen_ref
                            )
                            args = (
                                self.params["s3gen"],
                                jnp.zeros((Bv, 1, T), jnp.int32),
                                jnp.full((Bv, 1), T, jnp.int32),
                                rB,
                                jnp.zeros((Bv, state_len), jnp.float32),
                                jnp.zeros((Bv, 1), jnp.int32),
                                jnp.stack([jax.random.PRNGKey(0)] * Bv),
                                jnp.zeros((Bv,), jnp.int32),
                                jnp.zeros((Bv,), jnp.int32),
                            )
                            if cfm_cache is not None:
                                tails, _ = self.s3gen_scheduler._infer_fn(
                                    T, Bv, cached=True
                                )(*args, cfm_cache)
                            else:
                                tails, _ = self.s3gen_scheduler._infer_fn(T, Bv)(*args)
                            jax.block_until_ready(tails)

                        try:
                            await asyncio.to_thread(warm_batched)
                            compiled += 1
                            tick(compiled)
                        except Exception as exc:
                            # an unbuildable variant (HBM OOM) must not kill
                            # precompile NOR stay dispatchable: ban it so the
                            # scheduler forms smaller batches at this bucket
                            log.warning(
                                "precompile: S3Gen (bucket=%d, batch=%d) "
                                "failed (%s); banned", T, Bv, exc)
                            self.s3gen_scheduler.ban_batch(T, Bv)
                            break
                    state_len = self.s3gen_scheduler.state_len
                    for Bv, nb in sorted(stream_by_T.get(T, [])):
                        if stream0 is None:
                            break
                        if Bv > self.s3gen_scheduler.allowed_batch(T):
                            break
                        def warm_stream(T=T, Bv=Bv, nb=nb):
                            rB = jax.tree.map(
                                lambda x: jnp.stack([x] * Bv, 0), conds.gen_ref
                            )
                            tails, _, _ = self.s3gen_scheduler._infer_fn_stream(
                                T, Bv, nb
                            )(
                                self.params["s3gen"],
                                jnp.zeros((Bv, 1, T), jnp.int32),
                                jnp.full((Bv, 1), T, jnp.int32),
                                jnp.zeros((Bv, 1), jnp.int32),
                                rB,
                                jnp.zeros((Bv, state_len), jnp.float32),
                                jnp.zeros((Bv, 1), jnp.int32),
                                jnp.stack([jax.random.PRNGKey(0)] * Bv),
                                jnp.zeros((Bv,), jnp.int32),
                                [stream0] * Bv,
                                cfm_cache,
                            )
                            jax.block_until_ready(tails)

                        try:
                            await asyncio.to_thread(warm_stream)
                            compiled += 1
                            tick(compiled)
                        except Exception as exc:
                            log.warning(
                                "precompile: S3Gen stream (bucket=%d, "
                                "batch=%d) failed (%s); banned", T, Bv, exc)
                            self.s3gen_scheduler.ban_batch(T, Bv)
                            break
            if self.decoder is None:
                # single-slot serving path: warm the per-request decode views
                # for the smallest text bucket (the common case)
                depth = t3c.cond_len + self.cfg.text_bucket + 1 + t3c.max_speech_tokens
                Hk, Dh, L = t3c.num_kv_heads, t3c.head_dim, t3c.num_layers
                dt = jax.tree.leaves(self.params["t3"])[0].dtype
                if t3c.kv_cache_layout == "paired":
                    kv_shape = (L, 2, Hk // 2, depth, 2 * Dh)
                    scale_shape = (L, 2, Hk // 2, 2, depth)
                else:
                    kv_shape = (L, 2, depth, Hk, Dh)
                    scale_shape = (L, 2, depth, Hk)
                kv_dt = jnp.int8 if t3c.kv_cache_dtype == "int8" else dt
                cache_shapes = {
                    "k": jax.ShapeDtypeStruct(kv_shape, kv_dt),
                    "v": jax.ShapeDtypeStruct(kv_shape, kv_dt),
                    "start": jax.ShapeDtypeStruct((2,), jnp.int32),
                    "pos": jax.ShapeDtypeStruct((2,), jnp.int32),
                }
                if t3c.kv_cache_dtype == "int8":
                    cache_shapes["k_scale"] = jax.ShapeDtypeStruct(scale_shape, jnp.float32)
                    cache_shapes["v_scale"] = jax.ShapeDtypeStruct(scale_shape, jnp.float32)
                state_shapes = shape_of(
                    make_decode_state(jax.random.PRNGKey(0), t3c, 1, 0.8, 0.95, 0.5, 1.2)
                )
                for n, s_view in plan["decode"]:
                    def compile_view(s_view=s_view, n=n):
                        t3_decode_slice.lower(
                            params_shapes["t3"], t3c, cache_shapes, state_shapes,
                            n, s_view,
                        ).compile()

                    await asyncio.to_thread(compile_view)
                    compiled += 1
                    tick(compiled)
            log.info("Precompiled %d graph variants in the background", compiled)
        except asyncio.CancelledError:
            raise
        except Exception:
            log.warning("Background precompilation failed (continuing)", exc_info=True)

    async def _warmup_decoder(self) -> None:
        """Compile the batched insert + decode graphs by pushing one dummy
        chunk through the scheduler."""
        conds = self.voice_cache["default"]
        text = np.zeros((2, self.cfg.text_bucket), np.int32)
        async for _ in self.decoder.decode_chunk(
            np.asarray(conds.t3_cond_lanes), text, 4, 0.8, 0.95, 0.5, 1.2,
            max_new_tokens=self.decoder.slice_size,
            lookahead=_lookahead_size(self.decoder.slice_size),
        ):
            pass

    def _init_models(self) -> None:
        settings = get_settings()
        # Persistent XLA compilation cache: decode/synthesis graph variants
        # survive process restarts, so a restarted server is warm immediately.
        cache_dir = os.environ.get(
            "CHATTERBOX_COMPILE_CACHE", os.path.expanduser("~/.cache/chatterbox-tpu-xla")
        )
        if cache_dir and cache_dir != "0" and jax.default_backend() == "tpu":
            # TPU executables cache cleanly; XLA:CPU AOT entries are pinned to
            # exact host features and warn/recompile on reload — skip on CPU.
            try:
                os.makedirs(cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:
                log.warning("could not enable the XLA compilation cache", exc_info=True)
        dtype = jnp.bfloat16 if self.cfg.param_dtype == "bfloat16" else jnp.float32
        key = jax.random.PRNGKey(self.seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        model_dir = Path(settings.MODEL_PATH)
        loaded = None
        from .checkpoint import is_native_checkpoint

        if is_native_checkpoint(model_dir):
            from .checkpoint import load_checkpoint

            self._progress = "Loading native checkpoint..."
            loaded = load_checkpoint(model_dir, self.cfg, dtype)
            log.info("Loaded native checkpoint from %s", model_dir)
        elif (model_dir / "t3_cfg.safetensors").exists():
            from .loader import load_reference_checkpoint

            self._progress = "Loading checkpoint..."
            loaded = load_reference_checkpoint(model_dir, self.cfg, dtype)
        if loaded is not None:
            self.params = loaded
        else:
            log.info("No checkpoint found at %s — random-init weights", model_dir)
            self.params = {
                "t3": init_t3_params(k1, self.cfg.t3, dtype),
                "ve": init_voice_encoder_params(k4, self.cfg.ve, dtype),
            }
            if self.cfg.s3gen_arch == "ref":
                # the checkpoint tokenizer lives inside the s3gen_ref pytree
                self.params["s3gen"] = init_s3gen_ref_params(k2, self.cfg.s3gen_ref, dtype)
            else:
                self.params["s3gen"] = init_s3gen_params(k2, self.cfg.s3gen, dtype)
                self.params["s3tok"] = init_s3tok_params(k3, self.cfg.s3tok, dtype)
        # Multi-chip: tensor-parallel sharding of T3 over an ICI mesh
        # (CHATTERBOX_TP=N). Other models are small; they replicate.
        tp = int(os.environ.get("CHATTERBOX_TP", "0") or 0)
        if tp > 1:
            from ..parallel import make_mesh, shard_params

            self.mesh = make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
            sharded = {"t3": shard_params(self.params["t3"], self.mesh)}
            if self.cfg.s3gen_arch == "ref":
                # the flow conformer + CFM estimator carry the synthesis
                # FLOPs — TP-shard them too (tokenizer/CAMPPlus/HiFT and
                # non-divisible tiny leaves fall back to replication)
                from ..parallel.sharding import shard_s3gen_ref_params

                sharded["s3gen"] = shard_s3gen_ref_params(
                    self.params["s3gen"], self.cfg.s3gen_ref, self.mesh
                )
            rest = jax.device_put(
                {k: v for k, v in self.params.items() if k not in sharded}
            )
            self.params = {**sharded, **rest}
            log.info("tensor-parallel over %d devices (t3%s)", tp,
                     " + s3gen_ref" if "s3gen" in sharded else "")
        else:
            # one bulk host→HBM transfer (init tensors are built host-side)
            self.params = jax.device_put(self.params)
        tok_file = model_dir / "tokenizer.json"
        self.tokenizer = TextTokenizer(str(tok_file) if tok_file.exists() else None,
                                       self.cfg.t3.text_vocab_size)

    def _warmup(self) -> None:
        """Compile the hot graphs up front (reference warms torch.compile the
        same way, tts_streaming.py:274-326)."""
        conds = self._default_conditionals()
        tts_cfg = get_tts_config()
        slice_size = min(tts_cfg.AUDIO_TOKENS_PER_SLICE, self.cfg.max_new_tokens)
        if self.decoder is None:
            # per-request decode graphs (only used without the batched decoder)
            text = np.zeros((1, self.cfg.text_bucket), np.int32)
            cache = self._jit_prefill()(
                self.params["t3"], conds.t3_cond_lanes, jnp.asarray(np.repeat(text, 2, 0)),
                jnp.full((2,), 4, jnp.int32),
            )
            state = make_decode_state(
                jax.random.PRNGKey(0), self.cfg.t3, 1, 0.8, 0.95, 0.5, 1.2
            )
            # warm the SAME s_view variant the serving path uses first
            pos0 = self.cfg.t3.cond_len + self.cfg.text_bucket
            cache_depth = pos0 + 1 + self.cfg.t3.max_speech_tokens
            if self.cfg.t3.kv_cache_layout == "paired":
                s_view = min(cache_depth, ((pos0 + slice_size + 1 + 255) // 256) * 256)
            else:
                s_view = None
            tokens, cache, state = t3_decode_slice(
                self.params["t3"], self.cfg.t3, cache, state, slice_size, s_view
            )
            np.asarray(tokens)  # block
            # the first-slice look-ahead length is its own compiled variant
            la = min(_lookahead_size(slice_size), self.cfg.max_new_tokens)
            if la != slice_size:
                tokens, cache, state = t3_decode_slice(
                    self.params["t3"], self.cfg.t3, cache, state, la, s_view
                )
                np.asarray(tokens)
        bucket = _token_bucket_sizes(slice_size, self.cfg.t3.max_speech_tokens)[0]
        spt = self.gen_cfg.samples_per_token
        self._jit_s3gen()(
            self.params["s3gen"],
            jnp.zeros((1, bucket), jnp.int32),
            jnp.array([min(3, bucket)], jnp.int32),
            conds.gen_ref,
            jnp.zeros((1, bucket * spt), jnp.float32),
            jnp.array([0], jnp.int32),
            jax.random.PRNGKey(0),
            self._cfm_cache_for("default", conds),
        )[0].block_until_ready()

    # ------------------------------------------------------------- jit plumbing
    def _jit_prefill(self):
        if "prefill" not in self._jit_cache:
            cfg = self.cfg.t3

            def prefill(params, cond, text, text_len):
                return t3_prefill(params, cfg, cond, text, text_len)

            self._jit_cache["prefill"] = jax.jit(prefill)
        return self._jit_cache["prefill"]

    def _cfm_cache_mode(self) -> str:
        """CFM prompt-cache mode: "step" (per-Euler-step frozen prompt
        context — the DEFAULT) | "static" (one context reused every step,
        10× smaller) | "0" (off: the reference's full re-encode,
        /root/reference/src/tts_streaming.py:655-659). Deliberate deviation
        (one-way prompt attention): exactness mechanisms unit-tested in
        tests/test_cfm_prompt_cache.py, full-size divergence measured at the
        sampling-noise floor by scripts/quality_study.py (BENCH_NOTES Run E),
        5.9–8.9× per-call speedup (Run D). Ref arch only."""
        if self.cfg.s3gen_arch != "ref":
            return "0"
        v = os.environ.get("CHATTERBOX_CFM_PROMPT_CACHE", "step").lower()
        if v in ("1", "step"):
            return "step"
        if v == "static":
            return "static"
        return "0"

    def _jit_prompt_prefill(self):
        """Jitted per-voice CFM prompt prefill (mode baked in: the "static"
        reduction happens inside the graph, one dispatch per voice)."""
        if "prompt_prefill" not in self._jit_cache:
            refc = self.cfg.s3gen_ref
            static = self._cfm_cache_mode() == "static"

            def prefill(params, ref, key):
                cache = s3gen_ref_prompt_prefill(params, refc, ref, key)
                if static:
                    cache = {
                        "est": jax.tree.map(lambda a: a[-1:], cache["est"]),
                        "pv": cache["pv"],
                    }
                return cache

            self._jit_cache["prompt_prefill"] = jax.jit(prefill)
        return self._jit_cache["prompt_prefill"]

    def _cfm_cache_for(self, voice_id: str, conds: Conditionals) -> Optional[Dict]:
        """Per-voice frozen prompt context, built lazily at first request and
        LRU-bounded (CHATTERBOX_CFM_CACHE_VOICES, default 4 — each context is
        ~1.1 GB full-size bf16 in "step" mode). The prompt noise key is FIXED
        — voice-stable, mirroring the reference's one fixed rand_noise buffer
        per model — so the context is reusable across requests and chunks."""
        if self._cfm_cache_mode() == "0":
            return None
        hit = self._cfm_cache_lru.pop(voice_id, None)
        if hit is not None:
            self._cfm_cache_lru[voice_id] = hit  # move to MRU
            return hit
        cache = self._jit_prompt_prefill()(
            self.params["s3gen"], conds.gen_ref, jax.random.PRNGKey(777)
        )
        cap = max(1, int(os.environ.get("CHATTERBOX_CFM_CACHE_VOICES", "4")))
        while len(self._cfm_cache_lru) >= cap:
            evicted, _ = self._cfm_cache_lru.popitem(last=False)
            self._jit_cache.pop(f"stream0:{evicted}", None)
            log.info("CFM prompt cache: evicted voice '%s' (cap %d)", evicted, cap)
        self._cfm_cache_lru[voice_id] = cache
        return cache

    def _s3gen_infer_fn(self):
        """The active architecture's pure inference fn (identical signature)."""
        if self.cfg.s3gen_arch == "ref":
            cfg = self.cfg.s3gen_ref

            def infer(params, tokens, token_len, ref, src, cache_len, key,
                      cache=None):
                return s3gen_ref_inference(params, cfg, tokens, token_len, ref,
                                           src, cache_len, key, cfm_cache=cache)
        else:
            cfg = self.cfg.s3gen

            def infer(params, tokens, token_len, ref, src, cache_len, key,
                      cache=None):
                assert cache is None, "CFM prompt cache is a ref-arch feature"
                return s3gen_inference(params, cfg, tokens, token_len, ref, src, cache_len, key)

        return infer

    def _s3gen_tail_infer_fn(self):
        """Windowed-vocoder inference for the batched scheduler: vocode only a
        receptive-field window around the emitted tail (exact; see
        s3gen_ref_inference_tail). Full-overlap re-synthesis otherwise pays
        the 24 kHz conv stack over the whole accumulated waveform per slice.
        None for the DiT arch (falls back to full vocode + slice) or when
        CHATTERBOX_TAIL_VOCODE=0 (A/B escape hatch)."""
        if self.cfg.s3gen_arch != "ref":
            return None
        if os.environ.get("CHATTERBOX_TAIL_VOCODE", "1") != "1":
            return None
        cfg = self.cfg.s3gen_ref

        def tail_infer(params, tokens, token_len, ref, src, cache_len, key,
                       start, tail_len, cache=None):
            return s3gen_ref_inference_tail(
                params, cfg, tokens, token_len, ref, src, cache_len, key,
                start, tail_len, cfm_cache=cache,
            )

        return tail_infer

    def _s3gen_stream_infer_fn(self):
        """Streaming full-overlap inference for the batched scheduler: the
        CFM solves ONLY the slice's new frames against the request's frozen
        generated context (see s3gen_ref_inference_streaming) instead of
        re-solving the accumulated stream — the measured residual full-mode
        cost after the prompt cache (BENCH_NOTES Run G). Ref arch +
        per-Euler-step prompt cache only; None otherwise."""
        if self.cfg.s3gen_arch != "ref" or self._cfm_cache_mode() != "step":
            return None
        if os.environ.get("CHATTERBOX_CFM_STREAM", "1") != "1":
            return None
        cfg = self.cfg.s3gen_ref

        def stream_infer(params, tokens, token_len, new_len, ref, src,
                         cache_len, key, start, tail_len, rstate,
                         new_block_tokens, cache=None):
            return s3gen_ref_inference_streaming(
                params, cfg, tokens, token_len, new_len, ref, src, cache_len,
                key, start, tail_len, rstate, new_block_tokens,
                cfm_cache=cache,
            )

        return stream_infer

    def _stream_state0(self, voice_id: str, cfm_cache: Dict) -> Dict:
        """Fresh per-chunk streaming state template for a voice (immutable
        JAX arrays — shared by every request/chunk of the voice; built once
        per voice alongside the CFM prompt cache)."""
        key = f"stream0:{voice_id}"
        hit = self._jit_cache.get(key)
        if hit is not None and hit[0] is cfm_cache:
            return hit[1]
        refc = self.cfg.s3gen_ref
        window = int(os.environ.get("CHATTERBOX_STREAM_WINDOW", "512"))
        state = jax.jit(
            lambda c: init_s3gen_stream_state(
                refc, c, window, self._reachable_token_cap()
            )
        )(cfm_cache)
        self._jit_cache[key] = (cfm_cache, state)
        return state

    def _jit_s3gen(self):
        if "s3gen" not in self._jit_cache:
            self._jit_cache["s3gen"] = jax.jit(self._s3gen_infer_fn())
        return self._jit_cache["s3gen"]

    def _jit_cond(self):
        if "cond" not in self._jit_cache:
            t3c, vec, arch = self.cfg.t3, self.cfg.ve, self.cfg.s3gen_arch
            s3c = self.cfg.s3gen
            refc = self.cfg.s3gen_ref
            tokc = self.cfg.s3tok

            def build(params, wav24, wav24_len, wav16, wav16_len_enc, wav16_len_dec, exaggeration):
                # wav16 is one 10 s buffer with two valid lengths: the T3
                # prompt tokenizes ≤6 s (reference ENC_COND_LEN,
                # tts_streaming.py:369-372) while embed_ref/VE consume ≤10 s.
                # The ref arch tokenizes with the checkpoint tokenizer
                # (s3gen.tokenizer), exactly as the reference does.
                if arch == "ref":
                    prompt_tokens, prompt_len = s3tok_ref_tokenize(
                        params["s3gen"]["tokenizer"], refc.tokenizer, wav16, wav16_len_enc
                    )
                else:
                    prompt_tokens, prompt_len = s3tok_tokenize(
                        params["s3tok"], tokc, wav16, wav16_len_enc
                    )
                P = t3c.speech_cond_prompt_len
                prompt_tokens = prompt_tokens[:, :P]
                prompt_tokens = jnp.pad(
                    prompt_tokens, ((0, 0), (0, P - prompt_tokens.shape[1]))
                )
                t3_prompt_len = jnp.minimum(prompt_len, P)
                spk = voice_embed(params["ve"], vec, wav16, wav16_len_dec)
                cond = cond_embeddings(
                    params["t3"], t3c, spk, prompt_tokens, exaggeration, t3_prompt_len
                )
                uncond = cond_embeddings(
                    params["t3"], t3c, jnp.zeros_like(spk), prompt_tokens,
                    jnp.zeros_like(exaggeration), t3_prompt_len,
                )
                lanes = jnp.concatenate([cond, uncond], axis=0)  # [2, C, D]
                if arch == "ref":
                    ref = s3gen_ref_embed_ref(
                        params["s3gen"], refc, wav24, wav24_len, wav16, wav16_len_dec
                    )
                else:
                    from ..models.s3gen_ref.features import reflect_tail

                    fbank = log_mel_spectrogram(wav16, 16000, 400, 160, 80)
                    ref = s3gen_embed_ref(
                        params["s3gen"], s3c, reflect_tail(wav24, wav24_len), fbank,
                        prompt_tokens[:, : s3c.max_prompt_tokens],
                        jnp.minimum(prompt_len, s3c.max_prompt_tokens),
                        fbank_len=wav16_len_dec // 160,
                    )
                return lanes, ref

            self._jit_cache["cond"] = jax.jit(build)
        return self._jit_cache["cond"]

    # --------------------------------------------------------------- voices
    def _default_conditionals(self) -> Conditionals:
        """The no-voice_id conditionals: the snapshot's baked-in default voice
        (``conds.pt`` — reference tts_streaming.py:254-258, 399-406) when
        present; a neutral zero-waveform voice otherwise (random-weight /
        tiny-model runs have no snapshot)."""
        if "default" not in self.voice_cache:
            conds = None
            conds_file = Path(get_settings().MODEL_PATH) / "conds.pt"
            if conds_file.exists():
                if self.cfg.s3gen_arch == "ref":
                    try:
                        from .loader import load_default_conds

                        conds = self._conds_from_default_file(
                            load_default_conds(conds_file)
                        )
                        log.info("Default voice loaded from %s", conds_file)
                    except Exception:
                        log.warning(
                            "Failed to read %s; using the neutral default voice",
                            conds_file, exc_info=True,
                        )
                else:
                    log.warning(
                        "conds.pt found but s3gen_arch='dit' uses its own "
                        "conditioning format; using the neutral default voice."
                    )
            if conds is None:
                wav24 = jnp.zeros((1, 2 * S3GEN_SR))
                wav16 = jnp.zeros((1, 2 * S3_SR))
                lanes, ref = self._jit_cond()(
                    self.params, wav24, jnp.array([2 * S3GEN_SR], jnp.int32),
                    wav16, jnp.array([2 * S3_SR], jnp.int32), jnp.array([2 * S3_SR], jnp.int32),
                    jnp.array([get_tts_config().VOICE_EXAGGERATION_FACTOR], jnp.float32),
                )
                conds = Conditionals(lanes, ref)
            self.voice_cache["default"] = conds
        return self.voice_cache["default"]

    def _conds_from_default_file(self, raw: Dict) -> Conditionals:
        """Map the loaded ``conds.pt`` fields into engine Conditionals.

        The T3 lanes are built exactly as ``_jit_cond`` builds them for a live
        reference wav — same ``cond_embeddings`` call, with the stored speaker
        embedding / prompt tokens / baked-in exaggeration replacing the
        computed ones; the uncond lane zeroes speaker + exaggeration. The gen
        dict maps 1:1 onto the ``s3gen_ref_embed_ref`` contract (reference
        embed_ref output keys, tts_streaming.py:366)."""
        t3c = self.cfg.t3
        rc = self.cfg.s3gen_ref
        P = t3c.speech_cond_prompt_len
        toks = raw["prompt_speech_tokens"][:, :P]
        prompt = np.zeros((1, P), np.int32)
        prompt[0, : toks.shape[1]] = toks[0]
        prompt_len = np.array([toks.shape[1]], np.int32)
        exag = np.array([raw["emotion_adv"]], np.float32)

        if "cond_from_raw" not in self._jit_cache:

            def build(params, spk, prompt, plen, ex):
                cond = cond_embeddings(params, t3c, spk, prompt, ex, plen)
                uncond = cond_embeddings(
                    params, t3c, jnp.zeros_like(spk), prompt, jnp.zeros_like(ex), plen
                )
                return jnp.concatenate([cond, uncond], axis=0)

            self._jit_cache["cond_from_raw"] = jax.jit(build)
        lanes = self._jit_cache["cond_from_raw"](
            self.params["t3"], jnp.asarray(raw["speaker_emb"]), jnp.asarray(prompt),
            jnp.asarray(prompt_len), jnp.asarray(exag),
        )

        Pg, Pm, up = rc.max_prompt_tokens, rc.max_prompt_mel, rc.flow.up_stride
        gtok = np.zeros((1, Pg), np.int32)
        n_tok = min(raw["prompt_token"].shape[1], raw["prompt_token_len"], Pg)
        gtok[0, :n_tok] = raw["prompt_token"][0, :n_tok]
        mel = np.zeros((1, Pm, rc.n_mels), np.float32)
        n_mel = min(raw["prompt_feat"].shape[1], raw["prompt_feat_len"], Pm)
        mel[0, :n_mel] = raw["prompt_feat"][0, :n_mel]
        # reference alignment rule (s3gen_ref_embed_ref): mel frames == up_stride × tokens
        n_tok = min(n_tok, n_mel // up)
        n_mel = n_tok * up
        mel[0, n_mel:] = 0.0
        # dtypes must match s3gen_ref_embed_ref's outputs exactly (the S3Gen
        # micro-batcher stacks ref dicts across voices — a dtype mismatch
        # would silently promote and recompile): spk_emb follows the params
        # dtype, prompt_mel stays float32.
        param_dtype = jax.tree.leaves(self.params["s3gen"])[0].dtype
        ref = {
            "spk_emb": jnp.asarray(raw["embedding"], param_dtype),
            "prompt_tokens": jnp.asarray(gtok),
            "prompt_len": jnp.asarray([n_tok], jnp.int32),
            "prompt_mel": jnp.asarray(mel),
            "prompt_mel_len": jnp.asarray([n_mel], jnp.int32),
        }
        return Conditionals(lanes, ref)

    def prepare_conditionals(self, wav_fpath: str) -> None:
        """Compute and cache voice conditioning from a reference wav
        (reference tts_streaming.py:357-384)."""
        wav, sr = read_wav(wav_fpath)
        wav24 = resample(wav, sr, S3GEN_SR)[: self.DEC_COND_LEN]
        wav16 = resample(wav, sr, S3_SR)[: self.DEC16_COND_LEN]
        # static-size pads (one compiled graph for all voices); sub-10 s
        # prompt tail parity (ADVICE r2) is handled model-side by
        # features.reflect_tail inside both embed paths — one copy only
        w24 = np.zeros((1, self.DEC_COND_LEN), np.float32)
        w24[0, : len(wav24)] = wav24
        w16 = np.zeros((1, self.DEC16_COND_LEN), np.float32)
        w16[0, : len(wav16)] = wav16
        lanes, ref = self._jit_cond()(
            self.params, jnp.asarray(w24), jnp.array([len(wav24)], jnp.int32),
            jnp.asarray(w16),
            jnp.array([min(len(wav16), self.ENC_COND_LEN)], jnp.int32),
            jnp.array([len(wav16)], jnp.int32),
            jnp.array([get_tts_config().VOICE_EXAGGERATION_FACTOR], jnp.float32),
        )
        voice_id = Path(wav_fpath).name
        self.voice_cache[voice_id] = Conditionals(lanes, ref)
        log.info("Prepared conditionals for voice '%s'", voice_id)

    def clear_voice_cache(self, voice_id: str) -> None:
        self._cfm_cache_lru.pop(voice_id, None)
        self._jit_cache.pop(f"stream0:{voice_id}", None)
        if voice_id in self.voice_cache:
            del self.voice_cache[voice_id]
            log.info("Removed voice '%s' from cache.", voice_id)
        else:
            log.warning("Attempted to clear non-cached voice '%s'.", voice_id)

    async def _get_conds(self, voice_id: Optional[str], request_id: str) -> Conditionals:
        if not voice_id:
            return await asyncio.to_thread(self._default_conditionals)
        if voice_id not in self.voice_cache:
            path = self.voice_manager.get_voice_path(voice_id)
            if path is None:
                raise FileNotFoundError(f"Voice '{voice_id}' not found")
            log.info("[%s] Voice '%s' not cached; preparing conditionals", request_id, voice_id)
            await asyncio.to_thread(self.prepare_conditionals, path)
        return self.voice_cache[voice_id]

    # --------------------------------------------------------------- stream
    async def stream(
        self,
        text: str,
        output_format: str,
        voice_id: Optional[str],
        cfg_guidance_weight: float,
        synthesis_temperature: float,
        text_processing_chunk_size: int,
        audio_tokens_per_slice: int,
        remove_trailing_milliseconds: int,
        remove_leading_milliseconds: int,
        chunk_overlap_strategy: Literal["zero", "full"],
        crossfade_duration_milliseconds: int,
        request_id: str,
        cancellation_token: CancellationToken,
    ) -> AsyncGenerator[bytes, None]:
        tts_cfg = get_tts_config()
        async with self.tts_semaphore:
            if self._state != InitializationState.READY:
                raise RuntimeError(f"TTS Engine is not ready. Status: {self._state.value}")
            start_time = time.time()
            first_chunk = True

            conds = await self._get_conds(voice_id, request_id)
            cfm_cache = None
            stream0 = None
            if self._cfm_cache_mode() != "0":
                cfm_cache = await asyncio.to_thread(
                    self._cfm_cache_for, voice_id or "default", conds
                )
            if (
                cfm_cache is not None
                and chunk_overlap_strategy == "full"
                and self.s3gen_scheduler is not None
                and self.s3gen_scheduler._stream_infer is not None
            ):
                # streaming full-overlap: per-chunk fresh-state template
                stream0 = await asyncio.to_thread(
                    self._stream_state0, voice_id or "default", cfm_cache
                )
            text_chunks = await asyncio.to_thread(
                split_text_into_chunks, text, text_processing_chunk_size
            )
            if not text_chunks:
                yield b""
                return

            token_q: asyncio.Queue = asyncio.Queue(maxsize=tts_cfg.SPEECH_TOKEN_QUEUE_MAX_SIZE)
            pcm_q: asyncio.Queue = asyncio.Queue(maxsize=tts_cfg.PCM_CHUNK_QUEUE_MAX_SIZE)

            slice_size = _snap_slice_size(audio_tokens_per_slice, self.cfg.max_new_tokens)

            # progressive slices ride the streaming graphs' block ladder, so
            # they require the streaming full-overlap path to be active
            progressive = _progressive_enabled() and stream0 is not None

            t3_task = asyncio.create_task(
                self._t3_producer(
                    text_chunks, token_q, conds, cfg_guidance_weight,
                    synthesis_temperature, slice_size, request_id, cancellation_token,
                    progressive=progressive,
                )
            )
            s3_task = asyncio.create_task(
                self._s3gen_producer(
                    token_q, pcm_q, conds, chunk_overlap_strategy, slice_size,
                    crossfade_duration_milliseconds, remove_leading_milliseconds,
                    remove_trailing_milliseconds, len(text_chunks), request_id,
                    cancellation_token, cfm_cache, stream0,
                )
            )

            first_pcm_at = [None]  # TTFA anchor: first actual audio, not the
            # container header the encoder emits instantly

            async def pcm_generator():
                while True:
                    cancelled, item = await race_cancellation(pcm_q.get(), cancellation_token)
                    if cancelled or item is None:
                        break
                    if first_pcm_at[0] is None:
                        first_pcm_at[0] = time.time()
                    yield item

            encoder = AudioEncoder(output_format, self.sr, log_prefix=f"[{request_id}] ")
            from .metrics import metrics

            ttfa = None
            failed = False
            try:
                async for out in encoder.encode(pcm_generator()):
                    if first_chunk and first_pcm_at[0] is not None:
                        ttfa = first_pcm_at[0] - start_time
                        log.info("[%s] Time to first audio chunk: %.4fs", request_id, ttfa)
                        first_chunk = False
                    yield out
                err = self._request_errors.pop(request_id, None)
                if err is not None:
                    failed = True
                    raise RuntimeError(f"synthesis pipeline failed: {err}")
            finally:
                metrics.record_request(
                    ttfa, time.time() - start_time, failed,
                    cancellation_token.is_cancelled(),
                )
                self._request_errors.pop(request_id, None)
                for task in (t3_task, s3_task):
                    task.cancel()
                await asyncio.gather(t3_task, s3_task, return_exceptions=True)

    # ---------------------------------------------------------- T3 producer
    async def _t3_producer(
        self,
        text_chunks,
        token_q: asyncio.Queue,
        conds: Conditionals,
        cfg_weight: float,
        temperature: float,
        slice_size: int,
        request_id: str,
        token: CancellationToken,
        progressive: bool = False,
    ) -> None:
        t3p = self.params["t3"]
        t3c = self.cfg.t3
        try:
            for i, chunk in enumerate(text_chunks):
                if token.is_cancelled():
                    break
                t_start = time.time()
                ids = self.tokenizer.text_to_tokens(chunk)[0]
                ids = np.concatenate(
                    [[t3c.start_text_token], ids[: t3c.max_text_tokens - 2], [t3c.stop_text_token]]
                ).astype(np.int32)
                T_pad = _bucket(len(ids), self.cfg.text_bucket, t3c.max_text_tokens)
                padded = np.zeros((1, T_pad), np.int32)
                padded[0, : len(ids)] = ids
                lanes = np.repeat(padded, 2, axis=0)

                if self.decoder is not None:
                    n_slices = await self._produce_chunk_batched(
                        conds, lanes, len(ids), cfg_weight, temperature,
                        slice_size, token_q, token, i, len(text_chunks),
                        request_id, progressive=progressive,
                    )
                    log.info(
                        "[%s][T3] chunk %d/%d: %s slices (batched) in %.3fs",
                        request_id, i + 1, len(text_chunks), n_slices,
                        time.time() - t_start,
                    )
                    if n_slices < 0:  # cancelled mid-chunk
                        return
                    continue

                def prefill():
                    return self._jit_prefill()(
                        t3p, conds.t3_cond_lanes, jnp.asarray(lanes),
                        jnp.full((2,), len(ids), jnp.int32),
                    )

                cache = await asyncio.to_thread(prefill)
                state = make_decode_state(
                    jax.random.fold_in(
                        jax.random.PRNGKey(self.seed), _stable_seed(request_id) + i
                    ),
                    t3c, 1, temperature, 0.95, cfg_weight, 1.2,
                )

                produced = 0
                slice_idx = 0
                done = False
                pos0 = t3c.cond_len + T_pad
                # the per-request cache from t3_prefill is only this deep —
                # never let the attention view exceed it
                cache_depth = pos0 + 1 + t3c.max_speech_tokens
                while produced < self.cfg.max_new_tokens and not done:
                    if token.is_cancelled():
                        break
                    # first decode slice is the short look-ahead group
                    want = _lookahead_size(slice_size) if produced == 0 else slice_size
                    n = min(want, self.cfg.max_new_tokens - produced)
                    if t3c.kv_cache_layout == "paired":
                        need = pos0 + produced + n + 1
                        s_view = min(cache_depth, ((need + 255) // 256) * 256)
                    else:
                        s_view = None  # XLA slices copy; see scheduler note

                    def run_slice():
                        toks, new_cache, new_state = t3_decode_slice(
                            t3p, t3c, cache, state, n, s_view
                        )
                        # one bulk fetch (one tunnel round trip), not two
                        toks_h, done_h = jax.device_get((toks, new_state["done"]))
                        return toks_h, done_h, new_cache, new_state

                    toks, done_h, cache, state = await asyncio.to_thread(run_slice)
                    done = bool(done_h[0])
                    row = toks[0]
                    eos = np.where(row == t3c.stop_speech_token)[0]
                    if len(eos):
                        row = row[: eos[0]]
                    produced += n
                    # NOTE: even when EOS lands exactly on a slice boundary
                    # (empty row), a final item is emitted so the chunk's
                    # is_last_slice semantics — EOS-code append, trailing
                    # trim — always fire.
                    slice_idx += 1
                    item = {
                        "tokens": row,
                        "chunk_idx": i,
                        "slice_idx": slice_idx,
                        "is_first_slice": slice_idx == 1,
                        "is_last_slice": done or produced >= self.cfg.max_new_tokens,
                        "is_first_chunk": i == 0,
                        "is_last_chunk": i == len(text_chunks) - 1,
                    }
                    cancelled, _ = await race_cancellation(token_q.put(item), token)
                    if cancelled:
                        return
                log.info(
                    "[%s][T3] chunk %d/%d: %d slices in %.3fs",
                    request_id, i + 1, len(text_chunks), slice_idx, time.time() - t_start,
                )
        except Exception as exc:
            log.exception("[%s][T3] producer error", request_id)
            self._request_errors[request_id] = f"T3: {exc}"
        finally:
            # End-of-stream signal. On cancellation the consumer is likely
            # gone, and a fresh blocking await inside `finally` deadlocks a
            # task that is already being cancelled — use the non-blocking
            # variant there; bounded-blocking otherwise so no slice is lost.
            if token.is_cancelled():
                _queue_put_final(token_q, None)
            else:
                try:
                    await asyncio.wait_for(token_q.put(None), timeout=10)
                except BaseException:
                    _queue_put_final(token_q, None)

    async def _produce_chunk_batched(
        self,
        conds: Conditionals,
        lanes: np.ndarray,
        text_len: int,
        cfg_weight: float,
        temperature: float,
        slice_size: int,
        token_q: asyncio.Queue,
        token: CancellationToken,
        chunk_idx: int,
        n_chunks: int,
        request_id: str = "",
        progressive: bool = False,
    ) -> int:
        """Decode one text chunk through the continuous-batching scheduler and
        re-chunk its token stream into request-sized slices. Returns the slice
        count, or -1 if cancelled. With ``progressive`` (full-overlap
        streaming only — see _progressive_enabled) slices past the second
        grow toward PROGRESSIVE_SLICE_CAP."""
        buf = np.zeros((0,), np.int32)
        slice_idx = 0
        pending: Optional[dict] = None

        def make_item(tokens: np.ndarray, idx: int) -> dict:
            return {
                "tokens": tokens,
                "chunk_idx": chunk_idx,
                "slice_idx": idx,
                "is_first_slice": idx == 1,
                "is_last_slice": False,
                "is_first_chunk": chunk_idx == 0,
                "is_last_chunk": chunk_idx == n_chunks - 1,
            }

        async def emit(item: dict) -> bool:
            cancelled, _ = await race_cancellation(token_q.put(item), token)
            return not cancelled

        # first group goes out early (look-ahead) so S3Gen starts sooner; for
        # the request's FIRST chunk the scheduler also runs a short batch
        # slice so those tokens exist before a full slice completes (TTFA)
        target = min(_lookahead_size(slice_size), slice_size)
        async for row in self.decoder.decode_chunk(
            np.asarray(conds.t3_cond_lanes), lanes, text_len, temperature,
            0.95, cfg_weight, 1.2, self.cfg.max_new_tokens, token,
            seed=_stable_seed(request_id) + chunk_idx,
            lookahead=target if chunk_idx == 0 else 0,
        ):
            buf = np.concatenate([buf, row])
            while len(buf) >= target:
                if pending is not None and not await emit(pending):
                    return -1
                slice_idx += 1
                pending = make_item(buf[:target], slice_idx)
                buf = buf[target:]
                if progressive and slice_idx >= 2:
                    target = _next_slice_target(
                        target, slice_size, self.cfg.max_new_tokens
                    )
                else:
                    target = slice_size
                # tokens remain past the cut → this slice provably isn't the
                # last: emit NOW instead of holding it until the next decode
                # slice arrives. For the first (look-ahead) slice the holdback
                # was a full ~400 ms batch slice of first-audio latency
                # (measured scripts/ttfa_trace.py: TTFA 952 ms, 390 of them
                # the pending holdback).
                if len(buf):
                    if not await emit(pending):
                        return -1
                    pending = None
        if len(buf):
            if pending is not None and not await emit(pending):
                return -1
            slice_idx += 1
            pending = make_item(buf, slice_idx)
        if pending is None:
            # chunk produced zero tokens — still emit the final marker so
            # is_last_slice semantics (EOS append, trailing trim) fire
            slice_idx = 1
            pending = make_item(np.zeros((0,), np.int32), slice_idx)
        pending["is_last_slice"] = True
        if not await emit(pending):
            return -1
        return slice_idx

    # -------------------------------------------------------- S3Gen producer
    async def _s3gen_producer(
        self,
        token_q: asyncio.Queue,
        pcm_q: asyncio.Queue,
        conds: Conditionals,
        overlap: str,
        slice_size: int,
        crossfade_ms: int,
        lead_trim_ms: int,
        trail_trim_ms: int,
        n_chunks: int,
        request_id: str,
        token: CancellationToken,
        cfm_cache: Optional[Dict] = None,
        stream0: Optional[Dict] = None,
    ) -> None:
        from .s3gen_scheduler import MAX_TAIL_TOKENS

        s3p = self.params["s3gen"]
        s3c = self.gen_cfg
        spt = s3c.samples_per_token
        fade_len = int(self.sr * crossfade_ms / 1000.0)
        stitcher = CrossfadeStitcher(fade_len)
        buckets = _token_bucket_sizes(slice_size, self._reachable_token_cap())
        # request-stable noise key → deterministic re-synthesis (seam continuity)
        base_key = jax.random.fold_in(jax.random.PRNGKey(1234), _stable_seed(request_id))
        # streaming full-overlap (stream0 = the voice's fresh-state template):
        # the CFM solves only each slice's NEW tokens against the request's
        # frozen context instead of re-solving the accumulated stream; the
        # overlap window knob is superseded (no window drop ever happens)
        streaming = stream0 is not None and overlap == "full"

        acc_tokens = np.zeros((0,), np.int32)
        prev_samples = 0
        src_drop = 0
        src_valid = 0
        last_chunk_idx = -1
        source_cache = np.zeros((0,), np.float32)  # host path (no scheduler)
        source_state = None                        # device path (scheduler)
        rstate = None                              # streaming per-chunk state

        async def emit(audio: np.ndarray) -> bool:
            if audio.size == 0:
                return True
            cancelled, _ = await race_cancellation(
                pcm_q.put(float_to_pcm16(audio)), token
            )
            return not cancelled

        try:
            while True:
                cancelled, item = await race_cancellation(token_q.get(), token)
                if cancelled or item is None:
                    break
                t_start = time.time()
                row = item["tokens"]
                from .metrics import metrics

                metrics.record_tokens(len(row))
                t_prep0 = time.perf_counter()
                if item["chunk_idx"] != last_chunk_idx:
                    acc_tokens = np.zeros((0,), np.int32)
                    prev_samples = 0   # absolute emitted samples (filtered-token space)
                    src_drop = 0       # window-drop the source cache aligns to
                    src_valid = 0      # valid samples in the device state row
                    source_cache = np.zeros((0,), np.float32)
                    source_state = None
                    rstate = stream0 if streaming else None
                    last_chunk_idx = item["chunk_idx"]
                    chunk_key = jax.random.fold_in(base_key, item["chunk_idx"])

                new_toks = row
                if item["is_last_slice"]:
                    # reference quirk kept deliberately: speech EOS uses
                    # hp.stop_text_token (=0, a *valid* code) — tts_streaming.py:606,662-664
                    new_toks = np.concatenate(
                        [new_toks, [self.cfg.t3.stop_text_token]]
                    )
                new_toks = new_toks[new_toks < s3c.vocab_size]
                new_count = 0
                if overlap == "full":
                    prev_acc = acc_tokens.size
                    acc_tokens = np.concatenate([acc_tokens, new_toks])
                    if streaming and rstate is not None:
                        if acc_tokens.size == 0:
                            continue
                        if acc_tokens.size < 3:
                            # persist the min-conv pad IN the accumulated
                            # stream so the next slice's old/new split stays
                            # consistent with the frozen state (token 0 is a
                            # valid code — the reference EOS quirk)
                            acc_tokens = np.pad(
                                acc_tokens, (0, 3 - acc_tokens.size)
                            )
                        drop = 0
                        infer_tokens = acc_tokens
                        new_count = acc_tokens.size - prev_acc
                        if new_count == 0:
                            continue
                    else:
                        # Bounded re-synthesis window (CHATTERBOX_OVERLAP_
                        # WINDOW_TOKENS): the reference re-synthesizes the
                        # FULL accumulated stream every slice (quadratic —
                        # tts_streaming.py:655-659); a window keeps only the
                        # last W tokens of left context (the 10 s voice
                        # prompt is always present), bounding per-slice cost.
                        # 0 = reference behavior. Deliberate deviation when
                        # set; quality delta quantified by
                        # scripts/quality_study.py.
                        W = self.overlap_window
                        # never drop past the already-emitted prefix: with
                        # W < tokens-per-slice the naive acc−W drop would cut
                        # into NEW tokens (negative prev_rel → lost audio)
                        drop = (
                            max(0, min(acc_tokens.size - W, prev_samples // spt))
                            if W else 0
                        )
                        infer_tokens = acc_tokens[drop:]
                else:
                    infer_tokens = new_toks
                    drop = 0
                if infer_tokens.size == 0:
                    continue
                if infer_tokens.size < 3:
                    infer_tokens = np.pad(infer_tokens, (0, 3 - infer_tokens.size))

                T = next(b for b in buckets if b >= infer_tokens.size)
                padded = np.full((1, T), s3c.vocab_size, np.int32)
                padded[0, : infer_tokens.size] = infer_tokens
                valid = infer_tokens.size * spt
                prev_rel = prev_samples - drop * spt if overlap == "full" else 0

                if self.s3gen_scheduler is not None:
                    # device-resident source state: the excitation cache never
                    # round-trips and only the NEW audio tail is fetched
                    # (full-overlap waveforms grow quadratically; the tail is
                    # constant-size — measured r3 host/device breakdown)
                    stream_this = (
                        streaming and rstate is not None and overlap == "full"
                    )
                    if stream_this and new_count > min(MAX_TAIL_TOKENS, T):
                        # the decode loop never emits more than slice+EOS
                        # tokens; if it ever did, the right-packed streaming
                        # block would silently truncate — fall back to the
                        # accumulated re-solve for the rest of this chunk
                        log.error(
                            "[%s][S3GEN] %d new tokens exceed the streaming "
                            "block; falling back to re-solve", request_id,
                            new_count,
                        )
                        stream_this = False
                        rstate = None
                    shift = (drop - src_drop) * spt if overlap == "full" else 0
                    clen = (
                        max(0, min(src_valid - shift, T * spt))
                        if overlap == "full" else 0
                    )
                    metrics.record_stage("s3gen_prep_host", time.perf_counter() - t_prep0)
                    if stream_this:
                        tail_np, start_used, new_state, rstate = (
                            await self.s3gen_scheduler.synthesize(
                                padded[0], infer_tokens.size, conds.gen_ref,
                                source_state, clen, chunk_key,
                                shift=0, prev_rel=prev_rel,
                                keep_state=True, cache=cfm_cache,
                                new_len=new_count, rstate=rstate,
                            )
                        )
                    else:
                        tail_np, start_used, new_state = (
                            await self.s3gen_scheduler.synthesize(
                                padded[0], infer_tokens.size, conds.gen_ref,
                                source_state, clen, chunk_key,
                                shift=shift, prev_rel=prev_rel,
                                keep_state=(overlap == "full"),
                                cache=cfm_cache,
                            )
                        )
                    t_host0 = time.perf_counter()
                    audio = tail_np[prev_rel - start_used : valid - start_used]
                    if overlap == "full":
                        source_state = new_state
                        src_valid = valid
                        src_drop = drop
                        prev_samples = drop * spt + valid
                else:
                    src = np.zeros((1, T * spt), np.float32)
                    cache_len = 0
                    if overlap == "full":
                        # source cache aligns to the window start of the slice
                        # it was produced by; skip samples dropped since
                        off = (drop - src_drop) * spt
                        sc = source_cache[off:] if off < source_cache.size else source_cache[:0]
                        cache_len = min(sc.size, T * spt)
                        if cache_len:
                            src[0, :cache_len] = sc[:cache_len]
                    metrics.record_stage("s3gen_prep_host", time.perf_counter() - t_prep0)

                    def run():
                        w, ns = self._jit_s3gen()(
                            s3p, jnp.asarray(padded),
                            jnp.array([infer_tokens.size], jnp.int32),
                            conds.gen_ref, jnp.asarray(src),
                            jnp.array([cache_len], jnp.int32), chunk_key,
                            cfm_cache,
                        )
                        return np.asarray(w[0]), np.asarray(ns[0])

                    t_dev0 = time.perf_counter()
                    wav, new_src = await asyncio.to_thread(run)
                    metrics.record_stage("s3gen_single_device", time.perf_counter() - t_dev0)
                    t_host0 = time.perf_counter()
                    audio = wav[:valid]
                    if overlap == "full":
                        source_cache = new_src[:valid]
                        src_drop = drop
                        audio = audio[prev_rel:]
                        prev_samples = drop * spt + valid

                if item["is_first_chunk"] and item["is_first_slice"]:
                    audio = trim_leading(audio, lead_trim_ms, self.sr)
                if item["is_last_chunk"] and item["is_last_slice"]:
                    audio = trim_trailing(audio, trail_trim_ms, self.sr)

                log.info(
                    "[%s][S3GEN] slice %d (chunk %d/%d): %d tokens → %.2fs audio in %.3fs",
                    request_id, item["slice_idx"], item["chunk_idx"] + 1, n_chunks,
                    infer_tokens.size, len(audio) / self.sr, time.time() - t_start,
                )
                stitched = stitcher.push(audio)
                metrics.record_stage("s3gen_stitch_host", time.perf_counter() - t_host0)
                if not await emit(stitched):
                    return
        except Exception as exc:
            log.exception("[%s][S3GEN] producer error", request_id)
            self._request_errors[request_id] = f"S3Gen: {exc}"
        finally:
            if token.is_cancelled():
                _queue_put_final(pcm_q, None)
            else:
                try:
                    await emit(stitcher.flush())
                    await asyncio.wait_for(pcm_q.put(None), timeout=10)
                except BaseException:
                    _queue_put_final(pcm_q, None)
