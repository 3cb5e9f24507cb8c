"""S3Gen micro-batching scheduler.

At high stream counts the synthesis stage issues one S3Gen graph per request
chunk; each call is small (tens of ms) and leaves MXU headroom. This
scheduler coalesces concurrent chunk requests that share a token bucket into
ONE batched call — conditioning dicts stack along the batch axis (different
voices batch fine; all shapes are static), so B chunks cost far less than B
sequential dispatches.

Batches form greedily: whatever is queued for a bucket when the device frees
up goes out together (no artificial wait — single requests keep single-call
latency).
"""
from __future__ import annotations

import asyncio
import dataclasses
import time as _time
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..logging_config import log
from ..models.s3gen import S3GenConfig, s3gen_inference


@dataclasses.dataclass
class _Job:
    tokens: np.ndarray        # [T] bucket-padded
    token_len: int
    ref: Dict                 # per-request ref dict (leaves [1, ...])
    source: np.ndarray        # [T*spt]
    cache_len: int
    key: jax.Array
    future: asyncio.Future


class S3GenScheduler:
    def __init__(self, params: Dict, cfg, max_batch: int = 16, infer=None):
        """``infer``: per-item inference fn with the s3gen_inference signature
        (params, tokens, token_len, ref, src, cache_len, key) — lets the
        engine run either token→waveform architecture through the same
        micro-batcher. Defaults to the DiT path."""
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self._infer = infer or (
            lambda params, tk, tl, rf, sr, cl, ky: s3gen_inference(
                params, cfg, tk, tl, rf, sr, cl, ky
            )
        )
        self._queues: Dict[int, List[_Job]] = {}
        self._wake = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._jit = {}
        # stacked-conditioning cache: coalesced batches overwhelmingly share
        # the same voice combination (usually all-default), so the per-batch
        # jax.tree stack of B ref dicts (5 device ops + dispatches per batch)
        # is memoized on the identity of the member refs
        self._ref_cache: Dict[tuple, Dict] = {}

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

    def _infer_fn(self, T: int, B: int):
        jit_key = (T, B)
        if jit_key not in self._jit:
            item_infer = self._infer

            @jax.jit
            def infer(params, tokens, token_len, ref, src, cache_len, keys):
                # vmap over the micro-batch with PER-REQUEST noise keys, so a
                # request's CFM/source noise is identical whether it runs solo
                # or co-batched (reproducibility + seam determinism).
                def one(tk, tl, rf, sr, cl, ky):
                    return item_infer(params, tk, tl, rf, sr, cl, ky)

                return jax.vmap(one)(tokens, token_len, ref, src, cache_len, keys)

            self._jit[jit_key] = infer
        return self._jit[jit_key]

    def start(self) -> None:
        loop = asyncio.get_running_loop()
        if self._task is not None and not self._task.done() and self._loop is loop:
            return
        self._loop = loop
        self._wake = asyncio.Event()
        self._queues = {}
        self._task = loop.create_task(self._run())

    def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            self._task = None

    async def synthesize(
        self,
        tokens: np.ndarray,   # [T] bucket-padded
        token_len: int,
        ref: Dict,            # leaves [1, ...]
        source: np.ndarray,   # [T*spt]
        cache_len: int,
        key: jax.Array,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (wav [T*spt], new_source [T*spt])."""
        self.start()
        fut = asyncio.get_running_loop().create_future()
        self._queues.setdefault(len(tokens), []).append(
            _Job(tokens, token_len, ref, source, cache_len, key, fut)
        )
        self._wake.set()
        return await fut

    async def _run(self) -> None:
        spt = self.cfg.samples_per_token
        while True:
            bucket = next((b for b, q in self._queues.items() if q), None)
            if bucket is None:
                self._wake.clear()
                await self._wake.wait()
                continue
            queue = self._queues[bucket]
            # power-of-two batch sizes only: keeps the compiled-variant set
            # small ({1,2,4,8,16} instead of every B) while still collapsing
            # a 16-stream window into one dispatch. On the tunneled runtime
            # every dispatch costs ~30 ms of round-trip, so fewer, larger
            # calls matter beyond MXU utilization.
            take = 1
            while take * 2 <= min(len(queue), self.max_batch):
                take *= 2
            jobs, queue[:] = queue[:take], queue[take:]
            B, T = len(jobs), bucket

            def run_batch():
                from .metrics import metrics

                # leading vmap axis: each element keeps its own [1, ...] batch
                t0 = _time.perf_counter()
                tokens = jnp.asarray(np.stack([j.tokens[None] for j in jobs]))
                tlen = jnp.asarray([[j.token_len] for j in jobs], jnp.int32)
                src = jnp.asarray(np.stack([j.source[None] for j in jobs]))
                clen = jnp.asarray([[j.cache_len] for j in jobs], jnp.int32)
                ref = self._stacked_ref(jobs)
                keys = jnp.stack([j.key for j in jobs])
                metrics.record_stage("s3gen_stack_host", _time.perf_counter() - t0)
                wav, new_src = self._infer_fn(T, B)(
                    self.params, tokens, tlen, ref, src, clen, keys
                )
                return np.asarray(wav), np.asarray(new_src)

            from .metrics import metrics

            t0 = _time.perf_counter()
            try:
                wav, new_src = await asyncio.to_thread(run_batch)
                metrics.record_stage(
                    "s3gen_device", _time.perf_counter() - t0, items=len(jobs)
                )
                for i, job in enumerate(jobs):
                    if not job.future.done():
                        job.future.set_result((wav[i, 0], new_src[i, 0]))
            except asyncio.CancelledError:
                for job in jobs:
                    if not job.future.done():
                        job.future.cancel()
                raise
            except Exception as exc:
                log.exception("S3Gen batch failed")
                for job in jobs:
                    if not job.future.done():
                        job.future.set_exception(exc)
