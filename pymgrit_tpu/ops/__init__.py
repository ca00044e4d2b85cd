"""TPU-native numerical kernels used by the model zoo."""
