# TPU-native deployment (parity row for the reference's AWS/ECS stack,
# infra/terraform/aws/main.tf): one TPU VM per serving cell running the
# aiohttp service; the "vector database tier" is the chips' HBM, so
# there is no Milvus/etcd/MinIO trio to provision.  Scale out = more
# cells behind the load balancer; scale up = larger accelerator_type
# (the corpus shards over the slice's chips via parallel/).

terraform {
  required_providers {
    google = {
      source  = "hashicorp/google"
      version = ">= 5.0"
    }
  }
}

provider "google" {
  project = var.project
  region  = var.region
  zone    = var.zone
}

resource "google_service_account" "rag" {
  account_id   = "${var.name}-sa"
  display_name = "advanced-rag-tpu service account"
}

resource "google_compute_disk" "checkpoint" {
  count = var.cell_count
  name  = "${var.name}-ckpt-${count.index}"
  zone  = var.zone
  type  = "pd-balanced"
  size  = var.checkpoint_disk_gb
}

resource "google_tpu_v2_vm" "cell" {
  count            = var.cell_count
  name             = "${var.name}-${count.index}"
  zone             = var.zone
  runtime_version  = var.runtime_version
  accelerator_type = var.accelerator_type

  data_disks {
    source_disk = google_compute_disk.checkpoint[count.index].id
    mode        = "READ_WRITE"
  }

  network_config {
    network            = var.network
    enable_external_ips = false
  }

  service_account {
    email = google_service_account.rag.email
    scope = ["https://www.googleapis.com/auth/cloud-platform"]
  }

  metadata = {
    # provisioned by infra/scripts/deploy_tpu.sh via startup-script:
    # installs the wheel (from rag-wheel-uri — never public PyPI),
    # writes the systemd unit, starts the service
    startup-script = file("${path.module}/startup.sh")
    rag-wheel-uri  = var.wheel_uri
  }

  labels = {
    app = var.name
  }
}

resource "google_compute_firewall" "rag_api" {
  name    = "${var.name}-api"
  network = var.network

  allow {
    protocol = "tcp"
    ports    = ["8000"]
  }

  source_ranges = var.api_source_ranges
  target_service_accounts = [google_service_account.rag.email]
}
