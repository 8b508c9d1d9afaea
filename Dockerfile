# Service image (parity with the reference Dockerfile; CPU JAX by
# default — mount/point at a TPU runtime for accelerator serving).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
RUN pip install --no-cache-dir "jax[cpu]" flax optax aiohttp \
    prometheus_client pyyaml

COPY advanced_rag_tpu/ advanced_rag_tpu/
COPY config.template.yaml .

ENV PORT=8000 HOST=0.0.0.0 JAX_PLATFORMS=cpu
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s \
  CMD python -c "import urllib.request as u; u.urlopen('http://localhost:8000/healthz')"
CMD ["python", "-m", "advanced_rag_tpu.service.app"]
