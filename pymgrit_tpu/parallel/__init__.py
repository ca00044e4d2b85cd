"""Distribution over TPU device meshes (time x space)."""
