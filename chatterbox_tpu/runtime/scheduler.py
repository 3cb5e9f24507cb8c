"""Continuous-batching T3 decode scheduler.

Replaces the reference's scale story (one request per worker process, ZMQ
fair-queueing — SURVEY.md §2c) with the TPU-native one: N decode *slots*
share ONE set of model weights and ONE static KV cache
[L, 2N, S_max, H, Dh]; every jitted decode slice advances ALL slots together.
Because autoregressive decode is weight-bandwidth-bound, stepping 16 slots
costs nearly the same as stepping one — this is what multiplies concurrent
real-time streams per chip.

Requests join between slices (their text chunk is prefilled straight into
their slot's cache lanes), leave on EOS/cap/cancel, and idle slots simply
re-emit EOS inside the batch (masked, no cache advance — see
t3_decode_slice). The asyncio surface is one `decode_chunk` async generator
per text chunk, yielding numpy token slices.
"""
from __future__ import annotations

import asyncio
import dataclasses
import time as _time
from functools import partial
from typing import AsyncGenerator, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..logging_config import log
from ..models.t3 import T3Config, make_decode_state, t3_decode_slice
from ..models.t3.model import t3_prefill_raw
from .cancellation import CancellationToken


class DecodeError(RuntimeError):
    """The batched decoder loop died; in-flight requests must fail loudly."""


@dataclasses.dataclass
class _Submission:
    cond_lanes: np.ndarray   # [2, C, D]
    text: np.ndarray         # [2, T_pad]
    text_len: int
    temperature: float
    top_p: float
    cfg_weight: float
    rep_penalty: float
    max_new_tokens: int
    cancellation: Optional[CancellationToken]
    slot_future: asyncio.Future
    seed: int = 0
    # tokens the submitter wants EARLY (first-audio look-ahead). When > 0 and
    # the slot has produced nothing yet, the scheduler runs a short slice so
    # first audio doesn't wait behind a full slice_size batch step
    # (loaded-TTFA fix, VERDICT r2 item 7).
    lookahead: int = 0


# Short-slice lengths for fresh look-ahead admissions: two compiled variants
# cover every snapped slice size's look-ahead (3..20 tokens).
LOOKAHEAD_STEPS = (8, 20)


class BatchedT3Decoder:
    def __init__(
        self,
        params: Dict,
        cfg: T3Config,
        n_slots: int = 16,
        slice_size: int = 35,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.slice_size = slice_size
        L, Hk, Dh = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        S = cfg.max_seq_len
        B = 2 * n_slots
        dtype = jax.tree.leaves(params)[0].dtype
        self.cache = {
            "start": jnp.zeros((B,), jnp.int32),
            "pos": jnp.zeros((B,), jnp.int32),
        }
        if cfg.kv_cache_dtype == "int8" and cfg.kv_cache_layout == "paired":
            # int8 paired cache + seq-last scale planes: the grid-bounded
            # kernel DMAs half the bytes and dequantizes in-kernel
            self.cache.update(
                k=jnp.zeros((L, B, Hk // 2, S, 2 * Dh), jnp.int8),
                v=jnp.zeros((L, B, Hk // 2, S, 2 * Dh), jnp.int8),
                k_scale=jnp.zeros((L, B, Hk // 2, 2, S), jnp.float32),
                v_scale=jnp.zeros((L, B, Hk // 2, 2, S), jnp.float32),
            )
        elif cfg.kv_cache_dtype == "int8":
            self.cache.update(
                k=jnp.zeros((L, B, S, Hk, Dh), jnp.int8),
                v=jnp.zeros((L, B, S, Hk, Dh), jnp.int8),
                k_scale=jnp.zeros((L, B, S, Hk), jnp.float32),
                v_scale=jnp.zeros((L, B, S, Hk), jnp.float32),
            )
        elif cfg.kv_cache_layout == "paired":
            # head-paired layout for the grid-bounded decode kernel
            # (ops/pallas_attention_v3.py): [L, B, Hk//2, S, 2*Dh]
            self.cache.update(
                k=jnp.zeros((L, B, Hk // 2, S, 2 * Dh), dtype),
                v=jnp.zeros((L, B, Hk // 2, S, 2 * Dh), dtype),
            )
        else:
            self.cache.update(
                k=jnp.zeros((L, B, S, Hk, Dh), dtype),
                v=jnp.zeros((L, B, S, Hk, Dh), dtype),
            )
        self.state = make_decode_state(
            jax.random.PRNGKey(seed), cfg, n_slots, 0.8, 0.95, 0.5, 1.2
        )
        self.state["done"] = jnp.ones((n_slots,), bool)  # all slots idle

        self._free: List[int] = list(range(n_slots))
        self._queues: Dict[int, asyncio.Queue] = {}
        self._pos_host: Dict[int, int] = {}  # host-tracked cache fill per slot
        self._produced: Dict[int, int] = {}
        self._caps: Dict[int, int] = {}
        self._lookahead: Dict[int, int] = {}
        self._cancels: Dict[int, Optional[CancellationToken]] = {}
        self._pending: "asyncio.Queue[_Submission]" = asyncio.Queue()
        # high-watermark of slots decoded in one slice: observability that
        # continuous batching actually batches (tested out-of-the-box)
        self.max_active_seen = 0
        # first-audio gate (engine wires this to S3GenScheduler.wait_dispatch):
        # after a slice in which a fresh look-ahead slot produced its FIRST
        # tokens, the loop waits (bounded) for the next S3Gen dispatch to be
        # enqueued so the request's first synthesis wins the device-queue
        # race against this loop's next ~400 ms slice (TTFA; ttfa_trace.py)
        self.first_audio_gate = None
        self._wake = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._insert_jit = {}
        self._reset_jit = None
        self._finish_jit = None
        # pending warm jobs: [(decode_variants, insert_pads, lanes, future)]
        self._warm: List[tuple] = []

    # ------------------------------------------------------------ jit helpers
    def _insert_fn(self, T_pad: int):
        if T_pad not in self._insert_jit:
            cfg = self.cfg

            @partial(jax.jit, donate_argnums=(0,))
            def insert(cache, params, cond, text, tlen, slot):
                from ..models.t3.model import _quantize_kv

                k, v, pad = t3_prefill_raw(params, cfg, cond, text, tlen)
                P = cond.shape[1] + text.shape[1]
                lane = 2 * slot
                out = dict(cache)
                if cfg.kv_cache_layout == "paired":
                    from ..ops.pallas_attention_v3 import (
                        pack_cache_paired,
                        pack_scales_paired,
                    )

                    if cfg.kv_cache_dtype == "int8":
                        k, ks = _quantize_kv(k)
                        v, vs = _quantize_kv(v)
                        out["k_scale"] = jax.lax.dynamic_update_slice(
                            cache["k_scale"], pack_scales_paired(ks), (0, lane, 0, 0, 0)
                        )
                        out["v_scale"] = jax.lax.dynamic_update_slice(
                            cache["v_scale"], pack_scales_paired(vs), (0, lane, 0, 0, 0)
                        )
                    # one-time relayout per admission (≈100 MB), not per step
                    kp = pack_cache_paired(k)  # [L, 2, Hp, S, 2*Dh]
                    vp = pack_cache_paired(v)
                    out["k"] = jax.lax.dynamic_update_slice(cache["k"], kp, (0, lane, 0, 0, 0))
                    out["v"] = jax.lax.dynamic_update_slice(cache["v"], vp, (0, lane, 0, 0, 0))
                    out["start"] = jax.lax.dynamic_update_slice(cache["start"], pad, (lane,))
                    out["pos"] = jax.lax.dynamic_update_slice(
                        cache["pos"], jnp.full((2,), P, jnp.int32), (lane,)
                    )
                    return out
                if cfg.kv_cache_dtype == "int8":
                    kq, ks = _quantize_kv(k)
                    vq, vs = _quantize_kv(v)
                    out["k"] = jax.lax.dynamic_update_slice(cache["k"], kq, (0, lane, 0, 0, 0))
                    out["v"] = jax.lax.dynamic_update_slice(cache["v"], vq, (0, lane, 0, 0, 0))
                    out["k_scale"] = jax.lax.dynamic_update_slice(cache["k_scale"], ks, (0, lane, 0, 0))
                    out["v_scale"] = jax.lax.dynamic_update_slice(cache["v_scale"], vs, (0, lane, 0, 0))
                else:
                    out["k"] = jax.lax.dynamic_update_slice(cache["k"], k, (0, lane, 0, 0, 0))
                    out["v"] = jax.lax.dynamic_update_slice(cache["v"], v, (0, lane, 0, 0, 0))
                out["start"] = jax.lax.dynamic_update_slice(cache["start"], pad, (lane,))
                out["pos"] = jax.lax.dynamic_update_slice(
                    cache["pos"], jnp.full((2,), P, jnp.int32), (lane,)
                )
                return out

            self._insert_jit[T_pad] = insert
        return self._insert_jit[T_pad]

    def _reset_fn(self):
        if self._reset_jit is None:
            cfg = self.cfg

            @partial(jax.jit, donate_argnums=(0,))
            def reset(state, slot, temperature, top_p, cfg_w, rep_pen, seed):
                one = lambda arr, val: arr.at[slot].set(val)
                state = dict(state)
                state["last_token"] = one(state["last_token"], cfg.start_speech_token)
                state["step"] = one(state["step"], 0)
                state["done"] = one(state["done"], False)
                state["token_counts"] = state["token_counts"].at[slot].set(0)
                state["temperature"] = one(state["temperature"], temperature)
                state["top_p"] = one(state["top_p"], top_p)
                state["cfg_weight"] = one(state["cfg_weight"], cfg_w)
                state["rep_penalty"] = one(state["rep_penalty"], rep_pen)
                # per-slot key seeded ONLY by the request's stable seed —
                # reproducible regardless of batch history / co-tenants
                state["slot_keys"] = state["slot_keys"].at[slot].set(
                    jax.random.fold_in(jax.random.PRNGKey(7), seed)
                )
                return state

            self._reset_jit = reset
        return self._reset_jit

    def _finish_fn(self):
        if self._finish_jit is None:

            @partial(jax.jit, donate_argnums=(0,))
            def finish(state, slot):
                state = dict(state)
                state["done"] = state["done"].at[slot].set(True)
                return state

            self._finish_jit = finish
        return self._finish_jit

    # ------------------------------------------------------------- lifecycle
    def start(self) -> None:
        """(Re)start the scheduler loop on the CURRENT running event loop.

        The decoder may outlive an event loop (e.g. engine warm-up runs in one
        asyncio.run and serving in another); a task bound to a dead loop is
        replaced, along with the loop-affine primitives."""
        loop = asyncio.get_running_loop()
        if self._task is not None and not self._task.done() and self._loop is loop:
            return
        self._loop = loop
        self._wake = asyncio.Event()
        self._pending = asyncio.Queue()
        self._task = loop.create_task(self._run())

    def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            self._task = None
        # a warm_variants caller must not hang on a future the dead loop
        # will never resolve
        for job in self._warm:
            if not job[3].done():
                job[3].cancel()
        self._warm.clear()

    # -------------------------------------------------------------- client
    async def decode_chunk(
        self,
        cond_lanes: np.ndarray,
        text: np.ndarray,
        text_len: int,
        temperature: float,
        top_p: float,
        cfg_weight: float,
        rep_penalty: float,
        max_new_tokens: int,
        cancellation: Optional[CancellationToken] = None,
        seed: int = 0,
        lookahead: int = 0,
    ) -> AsyncGenerator[np.ndarray, None]:
        """Yield token slices (np.int32 arrays, EOS-trimmed) for one text
        chunk. The chunk occupies one slot until EOS / cap / cancellation.
        ``lookahead`` > 0 requests the first ~lookahead tokens via a short
        batch slice (first-audio latency; see _Submission)."""
        self.start()
        fut = asyncio.get_running_loop().create_future()
        await self._pending.put(
            _Submission(
                cond_lanes, text, text_len, temperature, top_p, cfg_weight,
                rep_penalty, max_new_tokens, cancellation, fut, seed,
                lookahead,
            )
        )
        self._wake.set()
        slot = await fut
        queue = self._queues[slot]
        while True:
            item = await queue.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item

    # ------------------------------------------------------------ scheduler
    async def _admit(self) -> None:
        while self._free and not self._pending.empty():
            sub = self._pending.get_nowait()
            if sub.cancellation is not None and sub.cancellation.is_cancelled():
                # the awaiting task may itself already be cancelled, leaving
                # the future done — resolving it again raises InvalidStateError
                # and would kill the decoder loop for every in-flight request
                if not sub.slot_future.done():
                    sub.slot_future.set_exception(asyncio.CancelledError())
                continue
            slot = self._free.pop(0)

            def do_insert():
                insert = self._insert_fn(sub.text.shape[1])
                # slot as a strong i32 scalar: a bare Python int traces
                # weak-typed, which would be a DIFFERENT jit variant than the
                # one _precompile lowers (first admission would recompile)
                self.cache = insert(
                    self.cache, self.params,
                    jnp.asarray(sub.cond_lanes), jnp.asarray(sub.text),
                    jnp.full((2,), sub.text_len, jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                )
                self.state = self._reset_fn()(
                    self.state, slot, sub.temperature, sub.top_p,
                    sub.cfg_weight, sub.rep_penalty, sub.seed,
                )

            from .metrics import metrics

            t0 = _time.perf_counter()
            try:
                await asyncio.to_thread(do_insert)
                metrics.record_stage("t3_prefill_device", _time.perf_counter() - t0)
            except Exception as exc:
                # the submission is already off the pending queue — its future
                # must fail here or the request hangs forever
                self._free.insert(0, slot)
                if not sub.slot_future.done():
                    sub.slot_future.set_exception(
                        DecodeError(f"prefill insert failed: {exc}")
                    )
                raise
            if sub.slot_future.done():
                # the waiter was cancelled while we prefilled its slot: nobody
                # will ever consume this slot, so park it done and hand the
                # slot back instead of set_result (→ InvalidStateError).
                self.state = self._finish_fn()(self.state, slot)
                self._free.insert(0, slot)
                continue
            self._queues[slot] = asyncio.Queue()
            self._pos_host[slot] = self.cfg.cond_len + sub.text.shape[1]
            self._produced[slot] = 0
            self._caps[slot] = sub.max_new_tokens
            self._lookahead[slot] = min(sub.lookahead, LOOKAHEAD_STEPS[-1])
            self._cancels[slot] = sub.cancellation
            sub.slot_future.set_result(slot)

    async def warm_variants(
        self, decode_variants, insert_pads, cond_lanes
    ) -> None:
        """One REAL dispatch per (n_steps, s_view) decode variant and per
        insert text bucket, serialized with live traffic through the
        scheduler loop (the shared cache/state are donated on every call, so
        a dispatch outside the loop would race live slices).

        Real dispatches — unlike lower().compile(), which only fills the
        persistent XLA cache — also populate the jit DISPATCH cache, so first
        traffic pays neither trace nor compile (measured r3: re-trace +
        deserialize at first traffic starved the 5-thread default executor
        into ~49 s/slice decode walls). With every slot idle a decode slice
        is a semantic no-op (done slots idle in place); a warm insert writes
        a free slot's lanes, which the next real admission fully overwrites.
        Warm steps only run while NO slot is active, one variant at a time,
        so a request arriving mid-warm is admitted between steps."""
        self.start()
        fut = asyncio.get_running_loop().create_future()
        self._warm.append(
            (list(decode_variants), list(insert_pads), np.asarray(cond_lanes), fut)
        )
        self._wake.set()
        await fut

    async def _warm_step(self) -> None:
        variants, inserts, lanes, fut = self._warm[0]
        try:
            if variants:
                n, s_view = variants.pop(0)

                def run_decode():
                    toks, cache, state = t3_decode_slice(
                        self.params, self.cfg, self.cache, self.state, n, s_view
                    )
                    self.cache, self.state = cache, state
                    jax.block_until_ready(toks)

                await asyncio.to_thread(run_decode)
            elif inserts:
                T_pad = inserts.pop(0)
                slot = self._free[0]  # no active slots → never empty

                def run_insert():
                    insert = self._insert_fn(T_pad)
                    self.cache = insert(
                        self.cache, self.params, jnp.asarray(lanes),
                        jnp.zeros((2, T_pad), jnp.int32),
                        jnp.full((2,), 1, jnp.int32),
                        jnp.asarray(slot, jnp.int32),
                    )
                    jax.block_until_ready(self.cache["pos"])

                await asyncio.to_thread(run_insert)
        except asyncio.CancelledError:
            raise
        except Exception:
            log.warning("decoder warm step failed (continuing)", exc_info=True)
        if not variants and not inserts:
            self._warm.pop(0)
            if not fut.done():
                fut.set_result(None)

    def _release(self, slot: int) -> None:
        q = self._queues.pop(slot, None)
        if q is not None:
            q.put_nowait(None)
        self._pos_host.pop(slot, None)
        self._produced.pop(slot, None)
        self._caps.pop(slot, None)
        self._lookahead.pop(slot, None)
        self._cancels.pop(slot, None)
        self._free.append(slot)

    async def _run(self) -> None:
        cfg = self.cfg
        try:
            while True:
                await self._admit()
                active = [s for s in range(self.n_slots) if s in self._queues]
                if not active:
                    if self._warm:
                        await self._warm_step()
                        continue
                    self._wake.clear()
                    await self._wake.wait()
                    continue

                # cancellations → force slots done
                for slot in list(active):
                    tok = self._cancels.get(slot)
                    if tok is not None and tok.is_cancelled():
                        self.state = self._finish_fn()(self.state, slot)
                        self._release(slot)
                        active.remove(slot)
                if not active:
                    continue
                self.max_active_seen = max(self.max_active_seen, len(active))

                # Fresh look-ahead admissions (nothing produced yet) get a
                # SHORT slice so their first audio doesn't wait behind a full
                # slice_size step for every slot (~500 ms at 16 slots); the
                # short slice costs ~fixed + 8·per-step. Only a request's
                # first text chunk asks for look-ahead, so steady-state
                # throughput is unaffected (VERDICT r2 item 7).
                fresh_la = [
                    self._lookahead[s] for s in active
                    if self._produced.get(s, 1) == 0 and self._lookahead.get(s, 0) > 0
                ]
                if fresh_la:
                    want = max(fresh_la)
                    n_steps = next(n for n in LOOKAHEAD_STEPS if n >= want)
                else:
                    n_steps = self.slice_size

                # Attention-view bucketing (reading only the filled cache
                # prefix) is only profitable through the Pallas kernel, whose
                # grid bounds the read without copying; XLA slices materialize
                # multi-GB temporaries (measured: 597 ms full-view vs 1529 ms
                # per-layer-slice at 16 slots). jnp path → full view.
                if cfg.kv_cache_layout == "paired":
                    max_pos = max(self._pos_host[s] for s in active)
                    need = max_pos + n_steps + 1
                    s_view = min(cfg.max_seq_len, ((need + 255) // 256) * 256)
                else:
                    s_view = None

                def run_slice():
                    toks, cache, state = t3_decode_slice(
                        self.params, cfg, self.cache, self.state,
                        n_steps, s_view,
                    )
                    self.cache, self.state = cache, state
                    # one bulk fetch (one tunnel round trip), not two
                    return jax.device_get((toks, state["done"]))

                from .metrics import metrics

                t0 = _time.perf_counter()
                tokens, done = await asyncio.to_thread(run_slice)
                metrics.record_stage(
                    "t3_decode_device", _time.perf_counter() - t0, items=len(active)
                )
                for s in active:
                    self._pos_host[s] += n_steps

                # slots whose first tokens this slice begin a first-audio path
                fresh_first = [
                    s for s in active
                    if self._produced.get(s) == 0 and self._lookahead.get(s, 0) > 0
                ]

                for slot in active:
                    row = tokens[slot]
                    eos = np.where(row == cfg.stop_speech_token)[0]
                    if len(eos):
                        row = row[: eos[0]]
                    cap = self._caps[slot]
                    remaining = cap - self._produced[slot]
                    row = row[:remaining]
                    if len(row):
                        self._produced[slot] += len(row)
                        self._queues[slot].put_nowait(row)
                    finished = bool(done[slot]) or self._produced[slot] >= cap
                    if finished:
                        if not bool(done[slot]):
                            self.state = self._finish_fn()(self.state, slot)
                        self._release(slot)

                if self.first_audio_gate is not None and any(
                    self._produced.get(s, 0) > 0 or s not in self._queues
                    for s in fresh_first
                ):
                    # bounded: a gate timeout only means the next decode slice
                    # starts on schedule (TTFA falls back to pre-gate behavior)
                    try:
                        await self.first_audio_gate()
                    except asyncio.CancelledError:
                        raise
                    except Exception:
                        log.warning("first-audio gate failed", exc_info=True)
                        self.first_audio_gate = None
        except asyncio.CancelledError:
            raise
        except Exception as exc:
            log.exception("Batched decoder loop crashed")
            err = DecodeError(f"batched decoder crashed: {exc}")
            # fail queued submissions loudly (their futures would never resolve)
            while not self._pending.empty():
                sub = self._pending.get_nowait()
                if not sub.slot_future.done():
                    sub.slot_future.set_exception(err)
            # active requests get the error BEFORE the end sentinel, so they
            # fail instead of "completing" with truncated audio
            for slot in list(self._queues):
                self._queues[slot].put_nowait(err)
                self._release(slot)
            # warm_variants callers would otherwise await a future the dead
            # loop never resolves (engine._precompile / serve_bench hang)
            for job in self._warm:
                if not job[3].done():
                    job[3].set_exception(err)
            self._warm.clear()
            self._task = None  # allow a fresh start() to spin a new loop
