# IndexTTS-TPU — TPU VM image (replaces the reference's CUDA 12.1 image).
# Build:  docker build -t indextts-tpu .
# Run  :  docker run --privileged --net=host -v $PWD/finetune_models:/app/finetune_models indextts-tpu
FROM python:3.12-slim

ENV PYTHONUNBUFFERED=1 \
    JAX_PLATFORMS=tpu \
    JAX_COMPILATION_CACHE_DIR=/app/.jax_cache

WORKDIR /app

RUN apt-get update && apt-get install -y --no-install-recommends \
        curl ca-certificates && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml ./
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint einops numpy pyyaml \
        scipy fastapi uvicorn tensorboardX

COPY indextts_tpu ./indextts_tpu
COPY tools ./tools
COPY scripts ./scripts
COPY bench.py run.sh ./
RUN pip install --no-cache-dir -e . && chmod +x run.sh scripts/*.sh

HEALTHCHECK --interval=60s --timeout=30s --retries=3 \
    CMD ["bash", "scripts/tpu-healthcheck.sh"]

EXPOSE 7859 7860
ENTRYPOINT ["./run.sh"]
CMD ["api"]
