from gmeta_tpu.models.gcn import init_params, forward  # noqa: F401
