# Service image (parity with the reference Dockerfile; CPU JAX by
# default — install the [tpu] extra / mount a TPU runtime for
# accelerator serving). Installs from the canonical manifests:
# requirements.txt pins the tested combination, pyproject.toml
# declares the package + entry point.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ curl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt pyproject.toml setup.py README.md ./
RUN pip install --no-cache-dir -r requirements.txt

COPY advanced_rag_tpu/ advanced_rag_tpu/
COPY config.template.yaml .
RUN pip install --no-cache-dir --no-deps .

ENV PORT=8000 HOST=0.0.0.0 JAX_PLATFORMS=cpu
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s \
  CMD curl -fsS http://localhost:8000/healthz || exit 1
CMD ["advanced-rag-tpu"]
