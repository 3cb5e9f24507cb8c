# chatterbox-tpu serving image (TPU VM host).
#
# Reference equivalent: /root/reference/Dockerfile (CUDA 12.4 runtime base,
# torch cu124, models baked in). TPU VMs ship libtpu on the host, so the image
# is a plain Python base + jax[tpu]; no driver env vars needed.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg curl g++ make \
    && rm -rf /var/lib/apt/lists/*

# Non-root user (parity with reference Dockerfile:21-27)
RUN useradd -m -u 1000 appuser
WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir "jax[tpu]" \
         -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY chatterbox_tpu/ chatterbox_tpu/
COPY static/ static/
COPY scripts/ scripts/
COPY run.py .

# Bake the pretrained models into the image (reference Dockerfile:50).
# Comment out to mount MODEL_PATH at runtime instead.
RUN python scripts/download_models.py models || true

COPY preloaded-voices/ preloaded-voices/
RUN mkdir -p voices && chown -R appuser:appuser /app

USER appuser
ENV HOST=0.0.0.0 PORT=8000 MODEL_PATH=/app/models
EXPOSE 8000

HEALTHCHECK --interval=30s --timeout=5s --start-period=180s \
    CMD curl -f http://localhost:8000/health || exit 1

CMD ["python", "run.py"]
