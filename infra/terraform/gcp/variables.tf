variable "project" { type = string }
variable "region" {
  type    = string
  default = "us-central2"
}
variable "zone" {
  type    = string
  default = "us-central2-b"
}
variable "name" {
  type    = string
  default = "advanced-rag-tpu"
}
variable "network" {
  type    = string
  default = "default"
}
variable "cell_count" {
  type        = number
  default     = 1
  description = "Serving cells (one TPU VM each) behind the LB"
}
variable "accelerator_type" {
  type        = string
  default     = "v5litepod-8"
  description = "v5litepod-1 to ~30M chunks; -8 shards to ~1B (PQ tier)"
}
variable "runtime_version" {
  type    = string
  default = "v2-alpha-tpuv5-lite"
}
variable "api_source_ranges" {
  type    = list(string)
  default = ["10.0.0.0/8"]
}
variable "wheel_uri" {
  type        = string
  description = "gs:// URI of the advanced_rag_tpu wheel built by deploy_tpu.sh"
}
variable "checkpoint_disk_gb" {
  type        = number
  default     = 100
  description = "Persistent disk for RAG_CHECKPOINT_DIR (survives VM replacement)"
}
