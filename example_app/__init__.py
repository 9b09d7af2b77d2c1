"""MSM offload service example app (see README.md in this directory)."""
