"""HTTP API routes (aiohttp).

Endpoint-for-endpoint and parameter-for-parameter compatible with the
reference FastAPI surface (/root/reference/src/api.py):

  GET  /                      web console
  GET|POST /tts/generate      streaming synthesis (auth)
  POST /voices                voice upload, 409 on duplicate (auth)
  GET  /voices                list voice ids (auth)
  DELETE /voices/{voice_id}   delete user voice, 404 if absent (auth)
  GET  /health                liveness (no auth)
  GET  /system-status         CPU/RAM + accelerator telemetry (auth)

Auth: ``X-API-Key`` header OR ``api_key`` query parameter (api.py:30-43).
The master/worker/ZMQ hop is gone: handlers call the in-process engine
directly (SURVEY.md §7 design stance).
"""
from __future__ import annotations

import asyncio
import uuid
from pathlib import Path
from typing import Optional

from aiohttp import web
from pydantic import BaseModel, ValidationError

from ..audio.encoding import AudioEncoder, FfmpegUnavailableError
from ..config import get_settings, get_tts_config
from ..logging_config import log
from ..runtime.cancellation import CancellationToken

STATIC_DIR = Path(__file__).resolve().parent.parent.parent / "static"

SUPPORTED_FORMATS = ("wav", "raw_pcm", "fmp4", "mp3", "webm")


def make_tts_request_model():
    """Request model with config-backed defaults (3-level precedence:
    request param > TTS_* env > coded default — reference api.py:45-56)."""
    cfg = get_tts_config()

    class TTSRequestModel(BaseModel):
        text: str = ""
        voice_id: Optional[str] = None
        format: Optional[str] = "wav"
        cfg_guidance_weight: float = cfg.CFG_GUIDANCE_WEIGHT
        synthesis_temperature: float = cfg.SYNTHESIS_TEMPERATURE
        text_processing_chunk_size: int = cfg.TEXT_PROCESSING_CHUNK_SIZE
        audio_tokens_per_slice: int = cfg.AUDIO_TOKENS_PER_SLICE
        remove_trailing_milliseconds: int = cfg.REMOVE_TRAILING_MILLISECONDS
        remove_leading_milliseconds: int = cfg.REMOVE_LEADING_MILLISECONDS
        chunk_overlap_strategy: str = cfg.CHUNK_OVERLAP_STRATEGY
        crossfade_duration_milliseconds: int = cfg.CROSSFADE_DURATION_MILLISECONDS

    return TTSRequestModel


def check_api_key(request: web.Request) -> None:
    key = request.headers.get("X-API-Key") or request.query.get("api_key")
    expected = get_settings().API_KEY
    if not key or key != expected:
        raise web.HTTPUnauthorized(
            text='{"detail": "Invalid or missing API Key"}', content_type="application/json"
        )


def register_api_routes(app: web.Application) -> None:
    routes = web.RouteTableDef()

    @routes.get("/")
    async def read_root(request: web.Request) -> web.StreamResponse:
        index = STATIC_DIR / "index.html"
        if index.exists():
            return web.FileResponse(index)
        return web.Response(text="chatterbox-tpu", content_type="text/plain")

    @routes.route("*", "/tts/generate")
    async def tts_generate(request: web.Request) -> web.StreamResponse:
        if request.method not in ("GET", "POST"):
            raise web.HTTPMethodNotAllowed(request.method, ["GET", "POST"])
        check_api_key(request)
        Model = make_tts_request_model()
        if request.method == "POST":
            try:
                body = await request.json()
                tts_request = Model(**body)
            except (ValueError, ValidationError):
                return web.json_response({"error": "Invalid JSON body"}, status=400)
        else:
            try:
                tts_request = Model(**dict(request.query))
            except ValidationError:
                return web.json_response({"error": "Invalid query parameters"}, status=400)

        if not tts_request.text:
            return web.json_response({"error": "Text is required"}, status=400)
        fmt = (tts_request.format or "wav").lower()
        if fmt not in SUPPORTED_FORMATS:
            return web.json_response(
                {
                    "detail": f"Invalid audio format: '{tts_request.format}'. "
                    f"Supported formats are: wav, raw_pcm, fmp4, mp3, webm"
                },
                status=400,
            )
        engine = request.app["engine"]
        if tts_request.voice_id and not request.app["voice_manager"].voice_exists(
            tts_request.voice_id
        ):
            return web.json_response(
                {"detail": f"Voice '{tts_request.voice_id}' not found."}, status=404
            )

        # fail BEFORE headers go out: once response.prepare() runs, any error
        # turns into an HTTP 200 with an aborted body (ADVICE r1)
        status = engine.get_initialization_status()
        if status.get("state") != "ready":
            return web.json_response(
                {"detail": f"TTS engine is not ready (state: {status.get('state')})."},
                status=503,
            )

        request_id = getattr(request, "request_id", None) or str(uuid.uuid4())
        token = CancellationToken()
        media_type = AudioEncoder(fmt, engine.sr).get_mime_type()
        response = web.StreamResponse(
            status=200, headers={"Content-Type": media_type, "X-Request-ID": request_id}
        )
        await response.prepare(request)
        active = request.app["active_requests"]
        active[request_id] = token
        try:
            async for chunk in engine.stream(
                text=tts_request.text,
                output_format=fmt,
                voice_id=tts_request.voice_id,
                cfg_guidance_weight=tts_request.cfg_guidance_weight,
                synthesis_temperature=tts_request.synthesis_temperature,
                text_processing_chunk_size=tts_request.text_processing_chunk_size,
                audio_tokens_per_slice=tts_request.audio_tokens_per_slice,
                remove_trailing_milliseconds=tts_request.remove_trailing_milliseconds,
                remove_leading_milliseconds=tts_request.remove_leading_milliseconds,
                chunk_overlap_strategy=tts_request.chunk_overlap_strategy,
                crossfade_duration_milliseconds=tts_request.crossfade_duration_milliseconds,
                request_id=request_id,
                cancellation_token=token,
            ):
                if chunk:
                    await response.write(chunk)
        except FfmpegUnavailableError as exc:
            log.warning("[%s] %s", request_id, exc)
        except (ConnectionResetError, asyncio.CancelledError):
            log.info("[%s] client disconnected; cancelling", request_id)
        finally:
            token.cancel()
            active.pop(request_id, None)
        await response.write_eof()
        return response

    @routes.post("/voices")
    async def upload_voice(request: web.Request) -> web.Response:
        check_api_key(request)
        reader = await request.multipart()
        field = await reader.next()
        while field is not None and field.name != "file":
            field = await reader.next()
        if field is None:
            return web.json_response({"error": "file field required"}, status=400)
        filename = field.filename or "voice.wav"
        contents = bytearray()
        while True:
            piece = await field.read_chunk()
            if not piece:
                break
            contents.extend(piece)
        vm = request.app["voice_manager"]
        try:
            vm.save_voice(filename, bytes(contents))
        except FileExistsError as exc:
            # Still warm the cache: on shared storage a broadcast upload can
            # land as a duplicate here while this node's cache is cold.
            engine = request.app["engine"]
            path = vm.get_voice_path(filename)
            if path and filename not in engine.voice_cache:
                asyncio.ensure_future(asyncio.to_thread(engine.prepare_conditionals, path))
            return web.json_response({"detail": str(exc)}, status=409)
        except ValueError as exc:
            return web.json_response({"detail": str(exc)}, status=400)
        # warm the conditioning cache in the background (reference broadcasts
        # warm_up_voices to all workers, api.py:149-151)
        engine = request.app["engine"]
        path = vm.get_voice_path(filename)
        asyncio.ensure_future(asyncio.to_thread(engine.prepare_conditionals, path))
        return web.json_response(
            {"voice_id": filename, "message": "Voice uploaded and cache warming initiated."},
            status=201,
        )

    @routes.get("/voices")
    async def list_voices(request: web.Request) -> web.Response:
        check_api_key(request)
        return web.json_response(request.app["voice_manager"].list_voices())

    @routes.delete("/voices/{voice_id}")
    async def delete_voice(request: web.Request) -> web.Response:
        check_api_key(request)
        voice_id = request.match_info["voice_id"]
        try:
            request.app["voice_manager"].delete_voice(voice_id)
        except FileNotFoundError:
            return web.json_response({"detail": f"Voice '{voice_id}' not found."}, status=404)
        request.app["engine"].clear_voice_cache(voice_id)
        return web.json_response({"message": f"Voice '{voice_id}' deleted successfully."})

    @routes.get("/health")
    async def health(request: web.Request) -> web.Response:
        return web.json_response({"status": "ok", "message": "Server is running."})

    @routes.get("/system-status")
    async def system_status(request: web.Request) -> web.Response:
        check_api_key(request)
        from ..runtime.metrics import metrics
        from .telemetry import cpu_status, tpu_status

        engine = request.app["engine"]
        return web.json_response(
            {
                "cpu": cpu_status(),
                "tpus": tpu_status(),
                "gpus": [],  # reference key kept for client compatibility
                "engine": engine.get_initialization_status(),
                "active_requests": len(request.app["active_requests"]),
                "metrics": metrics.snapshot(),
            }
        )

    @routes.post("/profile/start")
    async def profile_start(request: web.Request) -> web.Response:
        """Start a jax.profiler trace (TPU-native replacement for the
        reference's absent profiling story, SURVEY.md §5.1)."""
        check_api_key(request)
        import jax

        trace_dir = request.query.get("dir", "/tmp/chatterbox-trace")
        if request.app.get("profiling"):
            return web.json_response({"error": "profiling already active"}, status=409)
        jax.profiler.start_trace(trace_dir)
        request.app["profiling"] = trace_dir
        return web.json_response({"message": "profiling started", "dir": trace_dir})

    @routes.post("/profile/stop")
    async def profile_stop(request: web.Request) -> web.Response:
        check_api_key(request)
        import jax

        if not request.app.get("profiling"):
            return web.json_response({"error": "profiling not active"}, status=409)
        jax.profiler.stop_trace()
        trace_dir = request.app.pop("profiling")
        return web.json_response({"message": "profiling stopped", "dir": trace_dir})

    app.add_routes(routes)
    if STATIC_DIR.exists():
        app.router.add_static("/static", STATIC_DIR)
