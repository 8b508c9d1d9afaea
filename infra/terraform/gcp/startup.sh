#!/usr/bin/env bash
# TPU VM first-boot provisioning: venv + framework + systemd service.
# The framework wheel comes from the deploy bucket (metadata
# rag-wheel-uri, written by deploy_tpu.sh) — never from public PyPI
# (a name-squatted package would run as root: dependency confusion).
set -euo pipefail
apt-get update -y && apt-get install -y python3-venv
python3 -m venv /opt/rag
/opt/rag/bin/pip install --upgrade pip
/opt/rag/bin/pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

WHEEL_URI="$(curl -sf -H 'Metadata-Flavor: Google' \
  'http://metadata.google.internal/computeMetadata/v1/instance/attributes/rag-wheel-uri' || true)"
if [ -n "${WHEEL_URI}" ]; then
  gsutil cp "${WHEEL_URI}" /tmp/advanced_rag_tpu.whl
  # deps resolve from the wheel's pyproject metadata (service+models
  # extras) — the canonical manifest, not an ad-hoc list here
  /opt/rag/bin/pip install "/tmp/advanced_rag_tpu.whl[service,models]"
else
  echo "rag-wheel-uri metadata missing; service unit not written" >&2
  exit 1
fi

# checkpoint dir on the attached PERSISTENT disk (survives VM
# replacement — the boot disk is ephemeral); format on first use
DISK=/dev/disk/by-id/google-persistent-disk-1
if [ -e "${DISK}" ]; then
  blkid "${DISK}" >/dev/null 2>&1 || mkfs.ext4 -q "${DISK}"
  mkdir -p /var/lib/rag
  grep -q /var/lib/rag /etc/fstab || \
    echo "${DISK} /var/lib/rag ext4 defaults,nofail 0 2" >> /etc/fstab
  mountpoint -q /var/lib/rag || mount /var/lib/rag
fi
mkdir -p /var/lib/rag/checkpoint
cat > /etc/systemd/system/rag-api.service <<'UNIT'
[Unit]
Description=advanced-rag-tpu API
Wants=network-online.target
After=network-online.target

[Service]
Environment=RAG_MAX_CONCURRENCY=64
# service auto-loads this checkpoint at boot when present (app.py
# on_startup), so rolling restarts keep serving the corpus
Environment=RAG_CHECKPOINT_DIR=/var/lib/rag/checkpoint
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
