from super_gradients_tpu.training import dataloaders  # noqa: F401
