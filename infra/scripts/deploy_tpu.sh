#!/usr/bin/env bash
# Deploy/refresh the serving cells (reference parity: scripts/deploy_aws.sh).
#   ./deploy_tpu.sh <project> <wheel_bucket> [zone] [name]
# Builds the wheel from THIS checkout, uploads it, applies terraform
# (metadata carries the wheel URI), then rolling-updates every cell:
# install the new wheel + restart.  Cells re-serve their corpus via
# RAG_CHECKPOINT_DIR auto-load at boot (save a checkpoint first with
# POST /admin/index/checkpoint).
set -euo pipefail
PROJECT="${1:?usage: deploy_tpu.sh <project> <wheel_bucket> [zone] [name]}"
BUCKET="${2:?usage: deploy_tpu.sh <project> <wheel_bucket> [zone] [name]}"
ZONE="${3:-us-central2-b}"
NAME="${4:-advanced-rag-tpu}"

REPO_ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
cd "${REPO_ROOT}"
python3 -m pip wheel --no-deps -w dist .
WHEEL="$(ls -t dist/advanced_rag_tpu-*.whl | head -1)"
WHEEL_URI="gs://${BUCKET}/wheels/$(basename "${WHEEL}")"
gsutil cp "${WHEEL}" "${WHEEL_URI}"

cd infra/terraform/gcp
terraform init -input=false
terraform apply -input=false -auto-approve \
  -var "project=${PROJECT}" -var "zone=${ZONE}" -var "name=${NAME}" \
  -var "wheel_uri=${WHEEL_URI}"

for vm in $(terraform output -json cell_names | python3 -c \
    'import json,sys; print("\n".join(json.load(sys.stdin)))'); do
  gcloud compute tpus tpu-vm ssh "$vm" --zone "$ZONE" \
    --project "$PROJECT" --command "\
      sudo gsutil cp '${WHEEL_URI}' /tmp/advanced_rag_tpu.whl && \
      sudo /opt/rag/bin/pip install --force-reinstall --no-deps \
        /tmp/advanced_rag_tpu.whl && \
      sudo systemctl restart rag-api"
done
