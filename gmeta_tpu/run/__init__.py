from gmeta_tpu.run.train import Trainer, FitResult, build_datasets  # noqa: F401
