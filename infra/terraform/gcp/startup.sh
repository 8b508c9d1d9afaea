#!/usr/bin/env bash
# TPU VM first-boot provisioning: venv + framework + systemd service.
set -euo pipefail
apt-get update -y && apt-get install -y python3-venv
python3 -m venv /opt/rag
/opt/rag/bin/pip install --upgrade pip
/opt/rag/bin/pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
/opt/rag/bin/pip install flax optax aiohttp prometheus_client pyyaml advanced-rag-tpu
cat > /etc/systemd/system/rag-api.service <<'UNIT'
[Unit]
Description=advanced-rag-tpu API
After=network-online.target

[Service]
Environment=RAG_MAX_CONCURRENCY=64
ExecStart=/opt/rag/bin/python -m advanced_rag_tpu.service
Restart=always
RestartSec=5
KillSignal=SIGTERM
TimeoutStopSec=45

[Install]
WantedBy=multi-user.target
UNIT
systemctl daemon-reload
systemctl enable --now rag-api
