#!/usr/bin/env bash
# Deploy/refresh the serving cells (reference parity: scripts/deploy_aws.sh).
#   ./deploy_tpu.sh <project> [zone] [name]
set -euo pipefail
PROJECT="${1:?usage: deploy_tpu.sh <project> [zone] [name]}"
ZONE="${2:-us-central2-b}"
NAME="${3:-advanced-rag-tpu}"

cd "$(dirname "$0")/../terraform/gcp"
terraform init -input=false
terraform apply -input=false -auto-approve \
  -var "project=${PROJECT}" -var "zone=${ZONE}" -var "name=${NAME}"

# rolling service restart on every cell (checkpointed index reloads
# from the attached disk via load_index on boot)
for vm in $(terraform output -json cell_names | python3 -c \
    'import json,sys; print("\n".join(json.load(sys.stdin)))'); do
  gcloud compute tpus tpu-vm ssh "$vm" --zone "$ZONE" \
    --project "$PROJECT" --command "sudo systemctl restart rag-api"
done
