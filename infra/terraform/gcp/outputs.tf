output "cell_names" {
  value = google_tpu_v2_vm.cell[*].name
}
output "service_account" {
  value = google_service_account.rag.email
}
