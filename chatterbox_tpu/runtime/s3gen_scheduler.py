"""S3Gen micro-batching scheduler with device-resident streaming state.

At high stream counts the synthesis stage issues one S3Gen graph per request
chunk; each call is small (tens of ms) and leaves MXU headroom. This
scheduler coalesces concurrent chunk requests that share a token bucket into
ONE batched call — conditioning dicts stack along the batch axis (different
voices batch fine; all shapes are static), so B chunks cost far less than B
sequential dispatches.

Batches form greedily: whatever is queued for a bucket when the device frees
up goes out together (no artificial wait — single requests keep single-call
latency).

Host↔device traffic is the serving bottleneck on a tunneled runtime
(measured r3: the 16-stream wave spends ~40% of wall outside device compute),
so the streaming state never round-trips:

* the per-request excitation **source cache** (the chunk-continuity contract)
  lives on device as a fixed-size [STATE_LEN] row; each batch slices the
  window it needs (``shift``) inside the jitted graph and returns the updated
  row — zero host bytes;
* only the **new audio tail** is fetched to host (``prev_rel`` → a
  ≤ MAX_TAIL_TOKENS·spt slice cut inside the graph), instead of the full
  re-synthesized waveform — in "full"-overlap mode the full waveform grows
  quadratically while the tail is constant-size.
"""
from __future__ import annotations

import asyncio
import dataclasses
import os
import time as _time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..logging_config import log
from ..models.s3gen import s3gen_inference

# Upper bound on NEW tokens per synthesis call: the largest snapped
# audio_tokens_per_slice (100, engine.SLICE_SIZE_SNAP) + the appended EOS
# code. The fetched tail is min(MAX_TAIL_TOKENS, bucket)·spt samples.
MAX_TAIL_TOKENS = 101

# Static streaming-block ladder (tokens): the streaming CFM solves a
# right-packed block of new_block·up_stride frames per slice, so the block
# must be sized to the SLICE, not to MAX_TAIL_TOKENS — the r5 sweep measured
# the 101-token block costing 1.6-1.7 s/call at B=16 (every bucket ≥ 128)
# vs 0.9 s for the 35-token block: ~45% of full-overlap S3Gen wall was
# solving padding. Values cover every snapped slice size + the EOS code
# (engine.SLICE_SIZE_SNAP s → s+1 ≤ one of these).
STREAM_BLOCK_SNAP = (36, 71, 101)


def stream_block_tokens(max_new: int, bucket: int) -> int:
    """Smallest static streaming block that holds ``max_new`` new tokens,
    clamped to the bucket (accumulated ≥ new) and MAX_TAIL_TOKENS."""
    nb = next((s for s in STREAM_BLOCK_SNAP if s >= max_new), MAX_TAIL_TOKENS)
    return max(1, min(nb, MAX_TAIL_TOKENS, bucket))


@dataclasses.dataclass
class _Job:
    tokens: np.ndarray        # [T] bucket-padded
    token_len: int
    ref: Dict                 # per-request ref dict (leaves [1, ...])
    state: jax.Array          # [STATE_LEN] device-resident source cache row
    cache_len: int            # valid samples in state AFTER shift
    key: jax.Array
    shift: int                # samples to skip from state (window drop)
    prev_rel: int             # first NEW sample index (window-relative)
    future: asyncio.Future
    keep_state: bool = True   # caller wants the updated source row back
    # frozen per-voice CFM prompt context (engine Conditionals.cfm_cache).
    # Shared by every lane of a batch (vmap in_axes=None — no HBM copies),
    # so batches only form among jobs with the SAME cache object.
    cache: Optional[Dict] = None
    # streaming full-overlap: NEW tokens this slice + the request's frozen
    # generated-context state (device tree — see s3gen_ref_inference_streaming)
    new_len: int = 0
    rstate: Optional[Dict] = None


class S3GenScheduler:
    def __init__(self, params: Dict, cfg, max_batch: int = 16, infer=None,
                 state_tokens: int = 1032, tail_infer=None, stream_infer=None):
        """``infer``: per-item inference fn with the s3gen_inference signature
        (params, tokens, token_len, ref, src, cache_len, key) — lets the
        engine run either token→waveform architecture through the same
        micro-batcher. Defaults to the DiT path.

        ``tail_infer``: optional windowed-vocoder variant
        (… same args …, start, tail_len) → (wav_tail [1, tail_len], new_src).
        When provided, the model vocodes ONLY a receptive-field window around
        the emitted tail (exact — see s3gen_ref_inference_tail) instead of
        the full accumulated waveform, keeping per-slice vocoder cost
        constant in "full"-overlap mode.

        ``stream_infer``: optional streaming full-overlap variant
        (… tail_infer args …, new_len, rstate, new_block_tokens) →
        (wav_tail, new_src, new_rstate). Jobs submitted with ``rstate`` run
        through it: the CFM solves only the slice's NEW frames against the
        request's frozen generated context (see
        s3gen_ref_inference_streaming). Per-request state trees enter the
        batched graph as a LIST of job trees, are stacked/unstacked INSIDE
        the jit (device buffers ride the call by reference — zero extra
        dispatches on the tunneled runtime), and each job's future carries
        its new state tree back.

        ``state_tokens``: source-cache capacity in tokens (≥ the engine's
        largest token bucket)."""
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        # HBM guard: flow attention activations grow ~quadratically with the
        # token bucket, so batch×bucket must be capped — batch 16 at the
        # 1032-token bucket compiles to an 18.85 GB graph on a 15.75 GB v5e
        # (measured r3 serve_bench OOM). The 4096 token-product budget keeps
        # every reachable (bucket, batch) variant inside HBM: 16×256, 8×512,
        # 4×1002 (the ladder tops out at max_new_tokens+2; a bucket above
        # 1024 would be capped at batch 2 — size the budget accordingly).
        self.batch_token_budget = int(
            os.environ.get("CHATTERBOX_S3GEN_BATCH_TOKENS", "4096")
        )
        # (bucket → max batch) learned from compile failures: a variant that
        # OOMs at precompile (engine._precompile) or at dispatch is banned and
        # the batch re-forms smaller — requests never fail on a bad variant.
        self._batch_cap: Dict[int, int] = {}
        self.state_len = state_tokens * cfg.samples_per_token
        self._infer = infer or (
            lambda params, tk, tl, rf, sr, cl, ky: s3gen_inference(
                params, cfg, tk, tl, rf, sr, cl, ky
            )
        )
        self._tail_infer = tail_infer
        self._stream_infer = stream_infer
        self._queues: Dict[int, List[_Job]] = {}
        self._wake = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        # dispatch sequencing for the first-audio gate (see wait_dispatch):
        # bumped the moment a batched graph has been ENQUEUED on the device
        # (async dispatch returns before completion), not when it finishes
        self._dispatch_seq = 0
        self._dispatch_evt: Optional[asyncio.Event] = None
        self._jit = {}
        self._zero_state: Optional[jax.Array] = None
        # stacked all-zeros state rows per batch size: in zero-overlap mode
        # every job's state is the shared zero row, so the per-call
        # jnp.stack device op (one tunnel dispatch) can be skipped entirely
        self._zero_stacked: Dict[int, jax.Array] = {}
        # stacked-conditioning cache: coalesced batches overwhelmingly share
        # the same voice combination (usually all-default), so the per-batch
        # jax.tree stack of B ref dicts (5 device ops + dispatches per batch)
        # is memoized on the identity of the member refs
        self._ref_cache: Dict[tuple, Tuple[list, Dict]] = {}

    def zero_state(self) -> jax.Array:
        """The shared all-zeros source-cache row (first slice of a chunk)."""
        if self._zero_state is None:
            self._zero_state = jnp.zeros((self.state_len,), jnp.float32)
        return self._zero_state

    def _stacked_ref(self, jobs: List[_Job]) -> Dict:
        key = tuple(id(j.ref) for j in jobs)
        hit = self._ref_cache.get(key)
        if hit is not None:
            return hit[1]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *[j.ref for j in jobs])
        if len(self._ref_cache) >= 64:  # bounded: evict oldest insertion
            self._ref_cache.pop(next(iter(self._ref_cache)))
        # store the member refs too: pinning them makes the id()-tuple key
        # stable (a GC'd ref could otherwise alias a reused id)
        self._ref_cache[key] = ([j.ref for j in jobs], stacked)
        return stacked

    def _tail_len(self, T: int) -> int:
        return min(MAX_TAIL_TOKENS, T) * self.cfg.samples_per_token

    def allowed_batch(self, T: int) -> int:
        """Largest power-of-two batch the scheduler may form at bucket T."""
        b = self.max_batch
        while b > 1 and b * T > self.batch_token_budget:
            b //= 2
        return max(1, min(b, self._batch_cap.get(T, b)))

    def ban_batch(self, T: int, B: int) -> None:
        """Record that the (T, B) variant failed to compile/run; future
        batches at this bucket stay strictly below B."""
        cur = self._batch_cap.get(T, self.max_batch)
        self._batch_cap[T] = max(1, min(cur, B // 2))
        log.warning("S3Gen variant (bucket=%d, batch=%d) banned; cap now %d",
                    T, B, self._batch_cap[T])

    def _infer_fn(self, T: int, B: int, cached: bool = False):
        jit_key = (T, B, cached)
        if jit_key not in self._jit:
            item_infer = self._infer
            tail_infer = self._tail_infer
            spt = self.cfg.samples_per_token
            n = T * spt
            tail = self._tail_len(T)
            state_len = self.state_len

            @jax.jit
            def infer(params, tokens, token_len, ref, states, cache_len, keys,
                      shifts, starts, cache=None):
                # vmap over the micro-batch with PER-REQUEST noise keys, so a
                # request's CFM/source noise is identical whether it runs solo
                # or co-batched (reproducibility + seam determinism). The CFM
                # prompt cache is NOT vmapped: it is closed over, so XLA
                # broadcasts one copy across lanes instead of stacking B
                # copies in HBM (per-voice caches are ~100s of MB full-size).
                def one(tk, tl, rf, st, cl, ky, sh, strt):
                    src = jax.lax.dynamic_slice(st, (sh,), (n,))[None]
                    kw = {"cache": cache} if cached else {}
                    if tail_infer is not None:
                        # windowed vocoder: the model computes only the tail
                        # (exact — receptive-field margin inside the fn)
                        tail_out, new_src = tail_infer(
                            params, tk, tl, rf, src, cl, ky, strt[None], tail,
                            **kw,
                        )
                        tail_out = tail_out[0]
                    else:
                        wav, new_src = item_infer(params, tk, tl, rf, src, cl,
                                                  ky, **kw)
                        tail_out = jax.lax.dynamic_slice(wav[0], (strt,), (tail,))
                    new_state = jnp.zeros((state_len,), jnp.float32)
                    new_state = jax.lax.dynamic_update_slice(
                        new_state, new_src[0].astype(jnp.float32), (0,)
                    )
                    return tail_out, new_state

                return jax.vmap(one)(
                    tokens, token_len, ref, states, cache_len, keys, shifts, starts
                )

            self._jit[jit_key] = infer
        return self._jit[jit_key]

    def _infer_fn_stream(self, T: int, B: int, nb: int | None = None):
        """Batched streaming full-overlap graph: per-request state trees are
        stacked on entry and unstacked on exit INSIDE the jit, so the only
        host work per call is flattening the arg pytree. ``nb`` is the static
        streaming-block size in tokens (≥ every row's new_len; see
        stream_block_tokens) — the estimator's per-slice cost scales with it,
        so the dispatcher picks the smallest snapped block that fits."""
        if nb is None:
            nb = min(MAX_TAIL_TOKENS, T)
        jit_key = (T, B, nb, "stream")
        if jit_key not in self._jit:
            stream_infer = self._stream_infer
            spt = self.cfg.samples_per_token
            n = T * spt
            tail = self._tail_len(T)
            state_len = self.state_len
            new_block = nb

            @jax.jit
            def infer(params, tokens, token_len, new_len, ref, states,
                      cache_len, keys, starts, rstates, cache):
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *rstates)

                def one(tk, tl, nl, rf, st, cl, ky, strt, rs):
                    # streaming never window-drops: the source row's first
                    # n samples ARE the chunk prefix (shift ≡ 0)
                    src = st[:n][None]
                    tail_out, new_src, new_rs = stream_infer(
                        params, tk, tl, nl, rf, src, cl, ky, strt[None], tail,
                        rs, new_block, cache=cache,
                    )
                    new_state = jnp.zeros((state_len,), jnp.float32)
                    new_state = jax.lax.dynamic_update_slice(
                        new_state, new_src[0].astype(jnp.float32), (0,)
                    )
                    return tail_out[0], new_state, new_rs

                tails, new_states, new_r = jax.vmap(one)(
                    tokens, token_len, new_len, ref, states, cache_len, keys,
                    starts, stacked,
                )
                out_states = [jax.tree.map(lambda a: a[i], new_r)
                              for i in range(B)]
                return tails, new_states, out_states

            self._jit[jit_key] = infer
        return self._jit[jit_key]

    def start(self) -> None:
        loop = asyncio.get_running_loop()
        if self._task is not None and not self._task.done() and self._loop is loop:
            return
        self._loop = loop
        self._wake = asyncio.Event()
        self._dispatch_evt = asyncio.Event()
        self._queues = {}
        self._task = loop.create_task(self._run())

    def _signal_dispatch(self) -> None:
        """Loop-thread callback: a batch was enqueued on the device."""
        self._dispatch_seq += 1
        if self._dispatch_evt is not None:
            self._dispatch_evt.set()

    async def wait_dispatch(self, timeout: float = 0.25) -> bool:
        """Wait (bounded) until the NEXT batch dispatch is enqueued on the
        device. First-audio gate: the T3 decode loop calls this after a slice
        that produced a fresh request's first tokens, so that request's first
        S3Gen call wins the single-chip device-queue race against the next
        ~400 ms decode slice (measured scripts/ttfa_trace.py: the first
        S3Gen call otherwise serializes behind an already-enqueued decode
        slice — 410 ms wall for ~106 ms of compute)."""
        self.start()
        seq0 = self._dispatch_seq
        deadline = asyncio.get_running_loop().time() + timeout
        while self._dispatch_seq == seq0:
            remaining = deadline - asyncio.get_running_loop().time()
            if remaining <= 0:
                return False
            self._dispatch_evt.clear()
            try:
                await asyncio.wait_for(self._dispatch_evt.wait(), remaining)
            except asyncio.TimeoutError:
                return False
        return True

    def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            self._task = None

    async def synthesize(
        self,
        tokens: np.ndarray,       # [T] bucket-padded
        token_len: int,
        ref: Dict,                # leaves [1, ...]
        state: Optional[jax.Array],  # [state_len] device row (None = zeros)
        cache_len: int,           # valid source samples after shift
        key: jax.Array,
        shift: int = 0,           # window drop in samples
        prev_rel: int = 0,        # first new sample (window-relative)
        keep_state: bool = True,  # False: caller discards the new state row
        cache: Optional[Dict] = None,  # per-voice CFM prompt cache
        new_len: int = 0,         # streaming: NEW tokens this slice
        rstate: Optional[Dict] = None,  # streaming: per-request state tree
    ) -> Tuple[np.ndarray, int, jax.Array]:
        """→ (audio tail [tail_len] on host, tail start offset, new device
        state row — None when ``keep_state`` is False). The caller's new
        audio is ``tail[prev_rel - start :]`` up to its valid length.
        With ``rstate`` (streaming full-overlap) a 4th element is appended:
        the request's new state tree for the next slice."""
        self.start()
        fut = asyncio.get_running_loop().create_future()
        if state is None:
            state = self.zero_state()
        if rstate is not None:
            assert self._stream_infer is not None and cache is not None, \
                "streaming jobs need stream_infer and the CFM prompt cache"
        # queues key on (bucket, cache identity, streaming): the prompt cache
        # is a shared (unmapped) operand of the batched graph, so only jobs
        # with the same cache object can coalesce; streaming jobs compile a
        # different graph and never mix with re-solve jobs
        qkey = (len(tokens), id(cache) if cache is not None else 0,
                rstate is not None)
        self._queues.setdefault(qkey, []).append(
            _Job(tokens, token_len, ref, state, cache_len, key, shift, prev_rel,
                 fut, keep_state, cache, new_len, rstate)
        )
        self._wake.set()
        return await fut

    async def _run(self) -> None:
        spt = self.cfg.samples_per_token
        while True:
            qkey = next((k for k, q in self._queues.items() if q), None)
            if qkey is None:
                self._wake.clear()
                await self._wake.wait()
                continue
            bucket = qkey[0]
            queue = self._queues[qkey]
            # power-of-two COMPILED batch sizes only ({1,2,4,8,16}), but take
            # every queued job up to the cap and PAD the batch to the next
            # compiled size (repeat the last job's inputs; padded outputs are
            # dropped). Splitting a 6-job round into 4+2 calls doubles the
            # per-call fixed cost (~0.6 s dispatch+fetch on the tunneled
            # runtime, measured r3 Run B) — padding 6→8 wastes two lanes of
            # MXU compute instead, which is far cheaper at serving buckets.
            # Clamp the padded size to the largest power of two WITHIN the
            # cap: with a non-power-of-two max_batch (or learned cap), rounding
            # take up could otherwise dispatch an over-budget variant and burn
            # a compile/OOM cycle before ban_batch recovers (ADVICE r3).
            allowed = self.allowed_batch(bucket)
            b_cap = 1
            while b_cap * 2 <= allowed:
                b_cap *= 2
            take = min(len(queue), b_cap)
            B = 1
            while B < take:
                B *= 2
            jobs, queue[:] = queue[:take], queue[take:]
            T = bucket
            tail = self._tail_len(T)
            n = T * spt
            zero_row = self._zero_state

            def run_batch():
                from .metrics import metrics

                # leading vmap axis: each element keeps its own [1, ...] batch.
                # Pad rows repeat the LAST job (index min(i, take-1)) so every
                # lane has valid data; padded outputs are sliced off below.
                # Small integer operands stack host-side as np and ride the
                # jitted call's own transfer — each explicit jnp op here is a
                # separate ~30 ms tunnel dispatch (measured r3 Run B).
                t0 = _time.perf_counter()
                pj = jobs + [jobs[-1]] * (B - take)
                tokens = np.stack([j.tokens[None] for j in pj])
                tlen = np.asarray([[j.token_len] for j in pj], np.int32)
                if zero_row is not None and all(j.state is zero_row for j in pj):
                    # zero-overlap mode: every state is the shared zero row —
                    # reuse one cached stacked buffer, no device op at all
                    states = self._zero_stacked.get(B)
                    if states is None:
                        states = jnp.zeros((B, self.state_len), jnp.float32)
                        self._zero_stacked[B] = states
                else:
                    states = jnp.stack([j.state for j in pj])
                clen = np.asarray([[j.cache_len] for j in pj], np.int32)
                ref = self._stacked_ref(pj)
                keys = jnp.stack([j.key for j in pj])
                shift_vals = [min(max(j.shift, 0), self.state_len - n) for j in pj]
                if any(min(max(j.shift, 0), self.state_len - n) != max(j.shift, 0)
                       for j in jobs):
                    # the engine sizes state_tokens so this cannot happen
                    # (bucket + max per-slice shift); a clamp here means the
                    # excitation cache is misaligned — fail loud, not silent
                    log.error(
                        "S3Gen state shift clamped (bucket=%d, state_len=%d): "
                        "excitation continuity broken", T, self.state_len,
                    )
                shifts = np.asarray(shift_vals, np.int32)
                starts_host = [min(max(j.prev_rel, 0), max(0, n - tail)) for j in pj]
                starts = np.asarray(starts_host, np.int32)
                metrics.record_stage("s3gen_stack_host", _time.perf_counter() - t0)
                cache = jobs[0].cache
                out_rstates = None
                if jobs[0].rstate is not None:
                    nlen = np.asarray([[j.new_len] for j in pj], np.int32)
                    nb = stream_block_tokens(max(j.new_len for j in jobs), T)
                    tails, new_states, out_rstates = self._infer_fn_stream(T, B, nb)(
                        self.params, tokens, tlen, nlen, ref, states, clen,
                        keys, starts, [j.rstate for j in pj], cache,
                    )
                elif cache is not None:
                    tails, new_states = self._infer_fn(T, B, cached=True)(
                        self.params, tokens, tlen, ref, states, clen, keys,
                        shifts, starts, cache,
                    )
                else:
                    tails, new_states = self._infer_fn(T, B)(
                        self.params, tokens, tlen, ref, states, clen, keys,
                        shifts, starts,
                    )
                # the jitted call returned → the graph is enqueued (async
                # dispatch); signal the first-audio gate before blocking on
                # the fetch below
                loop = self._loop
                if loop is not None and not loop.is_closed():
                    try:
                        loop.call_soon_threadsafe(self._signal_dispatch)
                    except RuntimeError:
                        pass
                # only the tails cross the tunnel; states stay device-resident
                return np.asarray(tails), starts_host, new_states, out_rstates

            from .metrics import metrics

            t0 = _time.perf_counter()
            try:
                tails, starts_host, new_states, out_rstates = (
                    await asyncio.to_thread(run_batch)
                )
                dt = _time.perf_counter() - t0
                metrics.record_stage("s3gen_device", dt, items=len(jobs))
                log.info("[S3GEN] batch bucket=%d B=%d jobs=%d %.3fs", T, B, take, dt)
                for i, job in enumerate(jobs):
                    if not job.future.done():
                        # indexing new_states dispatches a device gather per
                        # row — skip it when the caller discards the state
                        # (zero-overlap slices: B fewer dispatches per call)
                        result = (
                            tails[i], starts_host[i],
                            new_states[i] if job.keep_state else None,
                        )
                        if out_rstates is not None:
                            result = result + (out_rstates[i],)
                        job.future.set_result(result)
            except asyncio.CancelledError:
                for job in jobs:
                    if not job.future.done():
                        job.future.cancel()
                raise
            except Exception as exc:
                if B > 1:
                    # compile/dispatch failure (e.g. HBM OOM on a large
                    # bucket×batch graph): ban the variant and retry the same
                    # jobs at a smaller batch — only a B=1 failure is fatal
                    log.warning("S3Gen batch (bucket=%d, batch=%d) failed "
                                "(%s); retrying smaller", bucket, B, exc)
                    self.ban_batch(bucket, B)
                    self._queues[qkey][:0] = jobs
                    continue
                log.exception("S3Gen batch failed")
                for job in jobs:
                    if not job.future.done():
                        job.future.set_exception(exc)
