"""Application factory: wires the engine, voice manager and routes.

Replaces the reference's FastAPI factory + master/worker split
(/root/reference/src/main.py:32-127): one process owns the engine (models in
HBM); startup initializes the engine and warms the voice-conditioning cache
for every stored voice (the reference broadcasts `warm_up_voices` after all
workers are ready, master.py:80-98).
"""
from __future__ import annotations

import asyncio
import time
import uuid
from typing import Optional

from aiohttp import web

from ..config import get_settings
from ..logging_config import configure_logging, log
from ..runtime.engine import TTSEngine
from .api import register_api_routes
from .voice_manager import VoiceManager


@web.middleware
async def request_context_middleware(request: web.Request, handler):
    """Request-id + duration logging (reference main.py:104-119); quiet
    paths skip access logging (main.py:19-29)."""
    request_id = str(uuid.uuid4())
    request.request_id = request_id
    start = time.time()
    try:
        response = await handler(request)
        return response
    finally:
        if request.path not in ("/health", "/system-status"):
            log.info(
                "[%s] %s %s took %.4fs", request_id, request.method, request.path,
                time.time() - start,
            )


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        response = web.Response()
    else:
        try:
            response = await handler(request)
        except web.HTTPException as exc:
            response = exc
    origins = get_settings().CORS_ORIGINS
    origin = request.headers.get("Origin")
    allow = "*" if "*" in origins else (origin if origin in origins else None)
    if allow:
        response.headers["Access-Control-Allow-Origin"] = allow
        response.headers["Access-Control-Allow-Headers"] = "X-API-Key, Content-Type"
        response.headers["Access-Control-Allow-Methods"] = "GET, POST, DELETE, OPTIONS"
    if isinstance(response, web.HTTPException):
        raise response
    return response


def create_app(engine: Optional[TTSEngine] = None, warm_voices: bool = True) -> web.Application:
    settings = get_settings()
    if not settings.API_KEY:
        raise RuntimeError("API_KEY must be set (environment variable or .env).")

    from ..runtime.engine import ensure_backend_initialized

    ensure_backend_initialized()  # MUST happen on the main thread, pre-loop
    app = web.Application(middlewares=[cors_middleware, request_context_middleware])
    app["engine"] = engine or TTSEngine()
    app["voice_manager"] = VoiceManager()
    app["active_requests"] = {}

    async def supervisor(app: web.Application) -> None:
        """Supervised engine restart (the reference has none — a crashed
        worker leaves requests hanging, SURVEY.md §5.3). If the engine lands
        in ERROR, rebuild and re-initialize it in place."""
        while True:
            await asyncio.sleep(10)
            eng: TTSEngine = app["engine"]
            if eng.get_initialization_status()["state"] == "error":
                log.warning("Engine in ERROR state — restarting")
                try:
                    eng.shutdown()  # free HBM BEFORE loading the replacement
                    new_engine = TTSEngine(eng.cfg)
                    await new_engine.ainit()
                    app["engine"] = new_engine
                    log.info("Engine restarted successfully")
                except Exception:
                    log.exception("Engine restart failed; retrying in 10s")

    async def on_startup(app: web.Application) -> None:
        eng: TTSEngine = app["engine"]
        if eng.get_initialization_status()["state"] == "not_started":
            await eng.ainit()
        app["supervisor_task"] = asyncio.ensure_future(supervisor(app))
        if warm_voices:
            async def warm():
                for vid in app["voice_manager"].list_voices():
                    path = app["voice_manager"].get_voice_path(vid)
                    try:
                        await asyncio.to_thread(eng.prepare_conditionals, path)
                    except Exception:
                        log.exception("Warm-up failed for voice %s", vid)
                log.info("Voice cache warm-up complete (%d voices)", len(eng.voice_cache))

            asyncio.ensure_future(warm())

    async def on_cleanup(app: web.Application) -> None:
        task = app.get("supervisor_task")
        if task:
            task.cancel()
        for token in list(app["active_requests"].values()):
            token.cancel()
        app["engine"].shutdown()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    register_api_routes(app)
    return app


def main() -> None:
    import os

    if os.environ.get("CHATTERBOX_FORCE_CPU") == "1":
        # the TPU plugin ignores JAX_PLATFORMS; this is the reliable override
        import jax

        jax.config.update("jax_platforms", "cpu")
    settings = get_settings()
    configure_logging(settings.LOG_LEVEL, tag="SERVER")
    app = create_app()
    web.run_app(app, host=settings.HOST, port=settings.PORT, access_log=None)


if __name__ == "__main__":
    main()
