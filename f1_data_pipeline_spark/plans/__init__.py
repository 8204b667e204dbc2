"""Plans: pipeline orchestration + incremental watermark control plane."""
