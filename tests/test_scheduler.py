"""Continuous-batching scheduler tests (tiny model, CPU)."""
import asyncio

import jax
import numpy as np
import pytest

from chatterbox_tpu.models.t3 import T3Config, cond_embeddings, init_t3_params
from chatterbox_tpu.runtime.cancellation import CancellationToken
from chatterbox_tpu.runtime.scheduler import BatchedT3Decoder

CFG = T3Config.tiny()


@pytest.fixture(scope="module")
def setup():
    params = init_t3_params(jax.random.PRNGKey(0), CFG)
    import jax.numpy as jnp

    spk = jnp.ones((1, CFG.speaker_embed_dim)) * 0.1
    prompt = jnp.zeros((1, CFG.speech_cond_prompt_len), jnp.int32)
    cond = cond_embeddings(params, CFG, spk, prompt, jnp.full((1,), 0.5))
    uncond = cond_embeddings(params, CFG, jnp.zeros_like(spk), prompt, jnp.zeros((1,)))
    lanes = np.asarray(jnp.concatenate([cond, uncond], 0))
    return params, lanes


def _text(tokens, T_pad=8):
    ids = np.asarray(tokens, np.int32)
    out = np.zeros((2, T_pad), np.int32)
    out[:, : len(ids)] = ids
    return out, len(ids)


async def _collect(decoder, lanes, text, tlen, max_new=24, token=None):
    rows = []
    async for row in decoder.decode_chunk(
        lanes, text, tlen, 0.8, 0.95, 0.5, 1.2, max_new, token
    ):
        rows.append(row)
    return np.concatenate(rows) if rows else np.zeros((0,), np.int32)


def test_single_request_roundtrip(setup):
    params, lanes = setup

    async def run():
        dec = BatchedT3Decoder(params, CFG, n_slots=4, slice_size=6)
        try:
            text, tlen = _text([255, 5, 6, 0])
            toks = await _collect(dec, lanes, text, tlen, max_new=20)
            return toks
        finally:
            dec.stop()

    toks = asyncio.run(run())
    assert 1 <= len(toks) <= 20
    assert ((toks < CFG.num_speech_codes)).all()  # EOS trimmed out


def test_concurrent_requests_share_batch(setup):
    params, lanes = setup

    async def run():
        dec = BatchedT3Decoder(params, CFG, n_slots=4, slice_size=6)
        try:
            text, tlen = _text([255, 7, 8, 9, 0])
            results = await asyncio.gather(
                *[_collect(dec, lanes, text, tlen, max_new=18) for _ in range(6)]
            )
            return results
        finally:
            dec.stop()

    results = asyncio.run(run())
    assert len(results) == 6  # 6 requests through 4 slots
    for toks in results:
        assert 1 <= len(toks) <= 18
        assert (toks < CFG.num_speech_codes).all()


def test_slot_reuse_and_cap(setup):
    params, lanes = setup

    async def run():
        dec = BatchedT3Decoder(params, CFG, n_slots=2, slice_size=4)
        try:
            text, tlen = _text([255, 3, 0])
            a = await _collect(dec, lanes, text, tlen, max_new=8)
            b = await _collect(dec, lanes, text, tlen, max_new=8)
            assert len(dec._free) == 2  # both slots returned
            return a, b
        finally:
            dec.stop()

    a, b = asyncio.run(run())
    assert len(a) <= 8 and len(b) <= 8


def test_queued_waiter_cancelled_while_slots_busy(setup):
    """Regression (ADVICE r1 high): a request cancelled while *queued* for a
    slot leaves its slot_future cancelled; _admit must not set_result /
    set_exception on it (InvalidStateError would kill the decoder loop and
    fail every in-flight request)."""
    params, lanes = setup

    async def run():
        dec = BatchedT3Decoder(params, CFG, n_slots=1, slice_size=4)
        try:
            text, tlen = _text([255, 4, 0])

            # occupy the only slot with a long request
            holder = asyncio.create_task(
                _collect(dec, lanes, text, tlen, max_new=40)
            )
            await asyncio.sleep(0.3)  # holder admitted, decoding

            # queue a second request, then cancel the awaiting task (client
            # disconnect while waiting for a slot)
            waiter = asyncio.create_task(
                _collect(dec, lanes, text, tlen, max_new=8)
            )
            await asyncio.sleep(0.05)
            waiter.cancel()
            with pytest.raises(asyncio.CancelledError):
                await waiter

            toks = await asyncio.wait_for(holder, timeout=120)
            # a third request must still be servable (loop alive, slot free)
            toks2 = await asyncio.wait_for(
                _collect(dec, lanes, text, tlen, max_new=8), timeout=120
            )
            return toks, toks2
        finally:
            dec.stop()

    toks, toks2 = asyncio.run(run())
    assert len(toks) >= 1 and len(toks2) >= 1


def test_lookahead_short_first_slice(setup):
    """A submission with lookahead>0 gets its first tokens from a SHORT batch
    slice (loaded-TTFA fix): the first yielded row must be at most the
    snapped look-ahead length, not a full slice_size row."""
    params, lanes = setup

    async def run():
        dec = BatchedT3Decoder(params, CFG, n_slots=2, slice_size=16)
        try:
            text, tlen = _text([255, 5, 6, 0])
            first_rows = []
            async for row in dec.decode_chunk(
                lanes, text, tlen, 0.8, 0.95, 0.5, 1.2, 40, None,
                lookahead=4,
            ):
                first_rows.append(row)
            return first_rows
        finally:
            dec.stop()

    rows = asyncio.run(run())
    assert rows, "no tokens produced"
    # snapped short slice = 8 (LOOKAHEAD_STEPS[0] >= 4), well under slice 16
    assert len(rows[0]) <= 8, len(rows[0])


def test_cancellation_releases_slot(setup):
    params, lanes = setup

    async def run():
        dec = BatchedT3Decoder(params, CFG, n_slots=2, slice_size=4)
        try:
            token = CancellationToken()
            text, tlen = _text([255, 4, 0])

            async def consume():
                got = 0
                async for row in dec.decode_chunk(
                    lanes, text, tlen, 0.8, 0.95, 0.5, 1.2, 1000, token
                ):
                    got += len(row)
                    token.cancel()
                return got

            got = await asyncio.wait_for(consume(), timeout=60)
            await asyncio.sleep(0.2)
            assert len(dec._free) == 2
            return got
        finally:
            dec.stop()

    got = asyncio.run(run())
    assert got >= 0
